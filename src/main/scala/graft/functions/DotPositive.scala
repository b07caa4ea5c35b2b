package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** `dot_decimal(a, b) > 0`, decided by filter-and-verify: one IEEE-double
  * pass computes the dot and a rigorous divergence bound
  * ([[DotDecimal.epsBound]]); when |dot| exceeds the bound the exact
  * decimal dot provably has the same sign (and provably isn't 0), so the
  * ~100× dearer decimal pass is skipped. Only near-orthogonal pairs — dot
  * within ~dim·1e-12 of zero — fall back to [[DotDecimal]].
  *
  * This is the sign-LSH bucket kernel: every vector evaluates it once per
  * hyperplane, so the whole bucket assignment becomes double-speed while
  * staying bit-identical (engine-independent buckets) by construction.
  * Null on length mismatch, like [[DotDecimal]].
  */
case class DotPositive(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_positive"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotPositive.positive(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // positive() returns null on length mismatch (boxed Boolean) — set isNull
  // from the result like DotDecimal does
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Boolean ${ev.value}$$box = graft.functions.DotPositive.positive($a, $b);
         |${ev.isNull} = (${ev.value}$$box == null);
         |${ev.value} = !${ev.isNull} && ${ev.value}$$box.booleanValue();
         |""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotPositive =
    copy(left = newLeft, right = newRight)
}

object DotPositive {
  /** Static so generated code can call it directly; null on length mismatch
    * (same contract as [[DotDecimal.dot]]).
    */
  def positive(a: ArrayData, b: ArrayData): java.lang.Boolean = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var sum = 0.0; var absSum = 0.0
    var i = 0
    while (i < n) {
      val p = a.getDouble(i) * b.getDouble(i)
      sum += p; absSum += math.abs(p)
      i += 1
    }
    if (math.abs(sum) > DotDecimal.epsBound(n, absSum))
      java.lang.Boolean.valueOf(sum > 0)
    else {
      // ambiguous near zero (or NaN, which compares false above): the exact
      // decimal dot decides, bit-identically to dot_decimal(a, b) > 0
      val dec = DotDecimal.dot(a, b)
      if (dec == null) null
      else java.lang.Boolean.valueOf(dec.toBigDecimal.signum > 0)
    }
  }
}
