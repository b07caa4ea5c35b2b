package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Plain IEEE-double dot product — the PREFILTER companion to
  * [[DotDecimal]]. Zero allocation, straight multiply-add loop behind
  * whole-stage codegen, ~an order of magnitude cheaper per pair than the
  * exact decimal fold.
  *
  * NOT cross-engine exact (double summation order matters), so it must
  * never decide a result: use it only to discard candidates that are far
  * from a threshold, then re-score the survivors with [[DotDecimal]]. The
  * divergence between this and the decimal dot is bounded by the per-term
  * quantization (≤ n·5e-13) plus double summation error — a prefilter
  * margin of 1e-4 is several orders of magnitude of slack.
  */
case class DotDouble(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_double"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotDouble.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // dot() returns null on length mismatch (boxed Double) — set isNull from
  // the result like DotDecimal does
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}$$box = graft.functions.DotDouble.dot($a, $b);
         |${ev.isNull} = (${ev.value}$$box == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : ${ev.value}$$box.doubleValue();
         |""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}

object DotDouble {
  /** Static so generated code can call it directly; null on length mismatch
    * (same contract as [[DotDecimal.dot]]).
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }
}
