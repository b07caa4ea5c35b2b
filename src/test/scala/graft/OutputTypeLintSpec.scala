package graft

import org.apache.spark.sql.types._

/** Registry-wide output-type lint (verdict r7 #2): every gate-facing result
  * schema must use only types with multi-round driver-hash evidence.
  *
  * Round 7's single red row was q03 emitting DECIMAL(33,6) — values
  * bit-identical to the oracle, but the driver's hasher canonicalizes
  * DECIMAL differently between its Spark-parquet and DuckDB paths, so the
  * hash failed on representation alone. This spec turns that class of
  * failure into a compile-round failure: any entry whose OUTPUT schema
  * contains a type outside the proven set (notably DecimalType — exact
  * decimal arithmetic is fine INTERNALLY, cast before emitting: see
  * NamedQuery.decSumStr) fails here, before the driver ever hashes it.
  *
  * The proven set is exactly what seven rounds of green gates exercised
  * (BIGINT, INTEGER, DOUBLE, VARCHAR, DATE, TIMESTAMP[_NTZ], BOOLEAN);
  * widen it only together with driver-hash evidence for the new type.
  */
class OutputTypeLintSpec extends SparkTestBase {

  private val allowedLeaf: Set[DataType] = Set(
    LongType, IntegerType, DoubleType, StringType, BooleanType,
    DateType, TimestampType, TimestampNTZType)

  private def allowed(dt: DataType): Boolean = allowedLeaf.contains(dt)

  private def violations(name: String, schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !allowed(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
    }

  test("every registry entry emits only driver-hash-proven output types") {
    val bad = Seq.newBuilder[String]
    // .schema only resolves the plan for lazily-built entries, but the
    // s-family fns run their streaming topology EAGERLY on construction —
    // so this spec's runtime is dominated by the 35 streaming entries
    // executing at sf0.001 (minutes, not seconds). Accepted: the lint
    // rides the same suite run that executes those specs anyway, and a
    // cached-schema registry would skip exactly the entries most likely
    // to change shape.
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      bad ++= violations(name, df.schema)
    }
    bad ++= violations("entry", SparkEntry.entry(spark).schema)
    val found = bad.result()
    assert(found.isEmpty,
      s"gate-facing schemas with unproven output types (cast before " +
        s"emitting — DECIMAL hashes differently across driver paths):\n  " +
        found.mkString("\n  "))
  }
}
