package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/** Exact decimal dot product of two double arrays — the native, codegen'd
  * replacement for the `aggregate(zip_with(...))` lambda fold in
  * [[GraftFunctions.dotDecimal]]. Semantics are IDENTICAL by construction:
  * each pairwise product (one IEEE-rounded double op) is quantized exactly
  * like Catalyst's `cast(double AS DECIMAL(_,12))` — shortest-repr
  * `BigDecimal.valueOf` then HALF_UP at scale 12 (`Decimal.set(BigDecimal)`
  * path) — and summed exactly in unscaled-long space (|terms| < 10^12,
  * thousands of dims away from long overflow).
  *
  * Why it matters: the similarity family evaluates this once per candidate
  * pair and per LSH plane; the interpreted HigherOrderFunction tree was the
  * bench's dominant cost. This expression is a tight loop behind
  * whole-stage codegen.
  */
case class DotDecimal(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DecimalType(30, 12)
  override def nullable: Boolean = true
  override def prettyName: String = "dot_decimal"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotDecimal.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // dot() returns null on length mismatch — defineCodeGen cannot represent a
  // null RESULT (it only null-checks inputs), so set isNull explicitly
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.DotDecimal.dot($a, $b);
         |${ev.isNull} = (${ev.value} == null);
         |""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotDecimal =
    copy(left = newLeft, right = newRight)
}

object DotDecimal {

  private val Scale = 12

  /** Rigorous bound on |exact-decimal dot − IEEE-double dot| for a
    * dimension-`dim` pair whose double pass accumulated `absSum` = Σ|aᵢ·bᵢ|.
    * Both paths multiply in double, so the only divergences are (a) the
    * per-term HALF_UP quantization to scale 12, ≤ 0.5e-12 each (doubled here
    * for slack), and (b) the double summation's rounding, ≤ (dim−1)·u·Σ|pᵢ|
    * with u = 2⁻⁵³ (coefficient doubled likewise). Lets filter-and-verify
    * callers certify comparisons from the cheap double pass alone.
    */
  def epsBound(dim: Int, absSum: Double): Double =
    dim * 1e-12 + dim * 2.3e-16 * absSum

  /** Static so generated code can call it directly. Length mismatch ⇒ null,
    * matching the lambda-fold reference (zip_with null-pads, poisoning the
    * sum) — a wrong-length vector must not yield a silently-partial score.
    */
  def dot(a: ArrayData, b: ArrayData): Decimal = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      val p = a.getDouble(i) * b.getDouble(i)
      // exact twin of Catalyst cast(double AS DECIMAL(*,12)):
      // shortest-repr BigDecimal then HALF_UP to scale 12
      sum += JBigDecimal.valueOf(p).setScale(Scale, RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      i += 1
    }
    Decimal(sum, 30, Scale)
  }
}
