package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table access (TESTDATA.md: TPC-H-ish star schema + events +
  * documents + embeddings, one parquet per table under `sf*`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns written as parquet TIMESTAMP(NANOS). Spark 4 cannot read nanos
    * natively (PARQUET_TYPE_ILLEGAL); with the `nanosAsLong` legacy conf it
    * reads them as LONG ns-since-epoch, which we truncate to µs
    * TIMESTAMP_NTZ — the same ns→µs truncation DuckDB applies, keeping the
    * oracle bit-identical.
    */
  private val nanosColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    nanosColumns.getOrElse(name, Nil).filter(raw.columns.contains).foldLeft(raw) {
      (df, c) =>
        df.withColumn(c,
          timestamp_micros(expr(s"$c div 1000")).cast("timestamp_ntz"))
    }
  }

  /** Register every fixture table as a temp view for `spark.sql`. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
