package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in [[QueriesCore]] (relational surface),
  * [[QueriesPipeline]] (LLM-data-pipeline operators) and
  * [[QueriesStreaming]] (Structured Streaming runs executed to completion
  * under the same gate); each entry pairs a Spark plan with a DuckDB
  * oracle where SQL-expressible.
  */
object SparkEntry {

  private def registry: Seq[NamedQuery] =
    QueriesCore.all ++ QueriesPipeline.all ++ QueriesStreaming.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own flagship shape: count over an offset window of an
    * event table (TestMinimalFunctionality.java:103 + offset pushdown C3).
    */
  def entry(spark: SparkSession): DataFrame = {
    val eng = GraftEngine.overFixtures(spark, "/root/testdata/sf0.001")
    eng.offsetWindow("tpch", "events",
      col("_offset") >= 100 && col("_offset") < 9000)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
