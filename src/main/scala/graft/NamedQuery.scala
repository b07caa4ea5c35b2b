package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One engine capability exposed through the harness contract: a Spark
  * query plus (when SQL-expressible) an equivalent DuckDB oracle. Column
  * names MUST match between the two — the driver sorts columns by name and
  * hashes values.
  */
final case class NamedQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object NamedQuery {

  /** Deterministic double aggregation: IEEE double products are
    * bit-identical across engines, but SUM order is not — so quantize each
    * addend to DECIMAL(23,6) (exact: fixture monetary values have ≤2
    * decimals, so 3-factor products have ≤6) and sum exactly. The sum is
    * cast STRAIGHT to double — no decimal rescale first (Spark rounds
    * half-up on rescale, DuckDB truncates) — which is a single correct
    * rounding in both engines while the unscaled value fits in 2^53, i.e.
    * |sum| < 9e9. Holds at verify scale (sf0.01); at real 100 TB scale the
    * output would stay DECIMAL end-to-end. SQL twin: [[sqlDecSum]].
    */
  def decSum(c: Column): Column = decSumAt(c, 23, 6)

  /** [[decSum]] at a caller-chosen precision/scale — for addends whose
    * exactness scale isn't the monetary 6 (e.g. p36's unit-interval quality
    * scores at scale 9). Same single-rounding contract: keep the SUM's
    * unscaled value below 2^53.
    */
  def decSumAt(c: Column, precision: Int, scale: Int): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")

  /** DuckDB twin of [[decSum]]. */
  def sqlDecSum(e: String): String = sqlDecSumAt(e, 23, 6)

  /** DuckDB twin of [[decSumAt]]. */
  def sqlDecSumAt(e: String, precision: Int, scale: Int): String =
    s"CAST(SUM(CAST($e AS DECIMAL($precision,$scale))) AS DOUBLE)"

  /** Order-insensitive double average: exact decimal sum / exact count,
    * one double division at the end.
    */
  def decAvg(c: Column): Column = decSum(c) / count(lit(1))

  def sqlDecAvg(e: String): String = s"${sqlDecSum(e)} / COUNT(*)"
}
