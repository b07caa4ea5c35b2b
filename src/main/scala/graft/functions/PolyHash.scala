package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's Unicode code points:
  * `h = fold(0, cp => (h * 31 + cp) mod 1_000_000_007)`.
  *
  * A native Catalyst expression (with `doGenCode`, so it stays inside
  * whole-stage codegen) rather than a Scala UDF: this hash sits in the hot
  * path of every dedup/fingerprint operator, evaluated once per token
  * occurrence — at 100 TB that is trillions of calls, and UDF boxing would
  * dominate the scan.
  *
  * The exact arithmetic is deliberately engine-portable: the DuckDB oracle
  * replays it as
  * `list_reduce(list_prepend(0, list_transform(string_split(s,''), c -> unicode(c))), (acc,c) -> (acc*31+c) % 1000000007)`
  * so hash-dependent operators (MinHash, SimHash, fingerprints) are
  * bit-checkable cross-engine. Accumulator stays < 2^30, so
  * `acc*31 + cp` never overflows a long.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  // Input typing is enforced at the helper ([[GraftFunctions.poly_hash]]
  // casts to string): AbstractDataType is private[sql], so an expression
  // living outside the spark package tree can't declare ExpectsInputTypes.
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Mult = 31L
  val Mod = 1000000007L

  /** Static so generated code can call it without capturing the expression. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** The DuckDB expression computing the identical hash of SQL string `e`. */
  def oracleSql(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($e, ''), c -> unicode(c)::BIGINT)), (acc, c) -> (acc * 31 + c) % 1000000007)"
}
