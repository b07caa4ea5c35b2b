package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Event collections stored as line-delimited JSON or CSV files — the
  * remaining batch source formats beside parquet fixtures and Kafka. Layout
  * `<root>/<collection>.<ext>`; the metastore schema is authoritative (no
  * inference — parity with the reference's metastore-driven typing,
  * SURVEY.md §1.3), malformed rows drop (C6 semantics), system columns are
  * synthesized like every other source (C7): `_offset` from an explicit
  * offset column when the collection has one, else null.
  */
final case class FileEventSource(
    rootDir: String,
    format: String, // "json" | "csv"
    offsetColumns: Map[String, String] = ParquetEventSource.defaultOffsetColumns)
    extends EventSource {

  require(format == "json" || format == "csv" || format == "orc",
    s"unsupported format: $format")

  override def read(spark: SparkSession, project: String, collection: String,
                    schema: StructType): DataFrame = {
    // DROPMALFORMED = the reference's log-and-skip row handling (text
    // formats only; ORC is self-describing binary — corruption surfaces as
    // a read error, not a malformed row)
    val reader = spark.read.schema(schema).option("mode", "DROPMALFORMED")
    val raw = format match {
      case "json" => reader.json(s"$rootDir/$collection.json")
      case "csv" =>
        // enforceSchema=false validates header names against the metastore
        // schema — a column-order mismatch fails loudly instead of silently
        // binding values positionally
        reader.option("header", "true").option("enforceSchema", "false")
          .csv(s"$rootDir/$collection.csv")
      case "orc" => reader.orc(s"$rootDir/$collection.orc")
    }
    EventSource.withSystemColumns(raw, project, collection, schema, offsetColumns)
  }
}
