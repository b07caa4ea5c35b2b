package graft

import org.apache.spark.sql.Row

/** The SQL-standard empty-input grand-total row (see
  * [[graft.plans.StandardGroupingSets]]): DuckDB/Postgres emit one
  * count=0 row for the `()` grouping set on empty input; stock Spark emits
  * none. The rule is opt-in, so both behaviors are pinned here.
  */
class StandardGroupingSetsSpec extends SparkTestBase {

  private val Flag = "spark.graft.sqlStandardGroupingSets"

  private def withFlag[T](on: Boolean)(f: => T): T = {
    spark.conf.set(Flag, on.toString)
    try f finally spark.conf.unset(Flag)
  }

  private def mkView(): Unit = {
    import spark.implicits._
    Seq((1, "a", 10L), (1, "b", 20L), (2, "a", 30L))
      .toDF("k1", "k2", "v").createOrReplaceTempView("gs_t")
  }

  test("empty input + GROUPING SETS incl. () yields the standard grand-total row") {
    mkView()
    val q = """SELECT k1, k2, count(*) AS cnt, sum(v) AS sv,
                      grouping(k1) AS g1, grouping(k2) AS g2
               FROM gs_t WHERE v > 1000
               GROUP BY GROUPING SETS ((k1), (k2), ())"""
    withFlag(on = false) { assert(spark.sql(q).collect().isEmpty) } // stock Spark
    withFlag(on = true) {
      val rows = spark.sql(q).collect()
      assert(rows.toSeq == Seq(Row(null, null, 0L, null, 1.toByte, 1.toByte)))
    }
  }

  test("empty input + ROLLUP/CUBE yield the implied grand-total row") {
    mkView()
    for (shape <- Seq("ROLLUP (k1, k2)", "CUBE (k1, k2)")) {
      withFlag(on = true) {
        val rows = spark.sql(
          s"SELECT k1, k2, count(*) AS cnt FROM gs_t WHERE v > 1000 GROUP BY $shape")
          .collect()
        assert(rows.toSeq == Seq(Row(null, null, 0L)), shape)
      }
    }
  }

  test("non-empty input is unchanged (no duplicate grand total)") {
    mkView()
    val q = """SELECT k1, count(*) AS cnt FROM gs_t
               GROUP BY GROUPING SETS ((k1), ()) ORDER BY k1 NULLS FIRST"""
    val off = withFlag(on = false) { spark.sql(q).collect().toSeq }
    val on = withFlag(on = true) { spark.sql(q).collect().toSeq }
    assert(on == off)
    assert(on == Seq(Row(null, 3L), Row(1, 2L), Row(2, 1L)))
  }

  test("HAVING still filters the restored row; no () set means no row") {
    mkView()
    withFlag(on = true) {
      // the fuzzer's HAVING cnt > 0 normalization now filters the restored
      // row — both engines agree on zero rows again
      assert(spark.sql(
        """SELECT k1, count(*) AS cnt FROM gs_t WHERE v > 1000
           GROUP BY GROUPING SETS ((k1), ()) HAVING count(*) > 0""").collect().isEmpty)
      // without the grand-total set the standard emits nothing on empty input
      assert(spark.sql(
        """SELECT k1, k2, count(*) AS cnt FROM gs_t WHERE v > 1000
           GROUP BY GROUPING SETS ((k1), (k2))""").collect().isEmpty)
    }
  }

  test("matches DuckDB semantics on the fuzzer's divergence shape") {
    // the exact shape gen_grouping_query produces, minus its HAVING guard:
    // grand total over an always-false predicate. DuckDB returns
    // (NULL, NULL, 0, NULL, NULL); with the flag the engine now does too.
    val docs = Tables.load(spark, sfDir, "documents")
    docs.createOrReplaceTempView("gs_docs")
    withFlag(on = true) {
      val rows = spark.sql(
        """SELECT source AS g0, lang AS g1, count(*) AS cnt,
                  CAST(sum(n_chars) AS BIGINT) AS a0, min(text) AS a1
           FROM gs_docs WHERE n_chars < -1
           GROUP BY ROLLUP (source, lang)""").collect()
      assert(rows.toSeq == Seq(Row(null, null, 0L, null, null)))
    }
  }
}
