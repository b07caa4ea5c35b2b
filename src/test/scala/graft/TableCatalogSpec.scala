package graft

class TableCatalogSpec extends SparkTestBase {

  private def withCatalog[T](f: => T): T = {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", sfDir)
    f
  }

  test("spark.sql resolves graft.<project>.<collection> via the DSv2 catalog") {
    withCatalog {
      val n = spark.sql("SELECT count(*) AS n FROM graft.tpch.lineitem").head().getLong(0)
      assert(n == Tables.load(spark, sfDir, "lineitem").count())
      // pushdown goes through Spark's native parquet DSv2 scan
      val plan = spark.sql(
        "SELECT l_orderkey FROM graft.tpch.lineitem WHERE l_quantity > 49")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49.0)]"), plan)
    }
  }

  test("SHOW TABLES lists collections; missing table raises TableNotFound parity") {
    withCatalog {
      val tables = spark.sql("SHOW TABLES IN graft.tpch").collect().map(_.getString(1)).toSet
      assert(Set("lineitem", "orders", "events", "documents").subsetOf(tables))
      val e = intercept[Exception](spark.sql("SELECT * FROM graft.tpch.nope").collect())
      assert(e.getMessage.toLowerCase.contains("table") || e.getMessage.contains("nope"))
    }
  }

  test("deep namespaces raise NoSuchNamespace instead of silently resolving flat") {
    withCatalog {
      // before the fix, graft.a.b.lineitem fell through to <root>/lineitem.parquet
      val e = intercept[Exception](
        spark.sql("SELECT count(*) FROM graft.a.b.lineitem").collect())
      val msg = e.getMessage.toLowerCase
      assert(msg.contains("namespace") || msg.contains("not found")
        || msg.contains("cannot be found"), e.getMessage)
      intercept[Exception](spark.sql("SHOW TABLES IN graft.a.b").collect())
    }
  }

  test("catalog is read-only (reference parity)") {
    withCatalog {
      intercept[Exception](
        spark.sql("DROP TABLE graft.tpch.lineitem"))
    }
  }
}
