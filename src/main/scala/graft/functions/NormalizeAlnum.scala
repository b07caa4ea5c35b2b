package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `trim(regexp_replace(lower(s), "[^a-z0-9]+", " "))` as one native char
  * loop — the fingerprint normalization kernel. The regex engine walks the
  * whole document with backtracking machinery and allocates a rewrite
  * buffer per match; this expression lower-cases once and folds the
  * character-class scan into a single pass. Semantics are an exact twin of
  * the composed builtins (and of the DuckDB oracle's
  * `trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))`): after
  * lowercasing, every maximal run of chars outside `[a-z0-9]` — including
  * any non-ASCII — collapses to one space, and leading/trailing spaces are
  * trimmed. Only `[a-z0-9]` survive, so the scan is safely per UTF-16 unit
  * (no multi-unit code point matches the kept class).
  */
case class NormalizeAlnum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "normalize_alnum"

  override protected def nullSafeEval(s: Any): Any =
    NormalizeAlnum.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeAlnum.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeAlnum =
    copy(child = newChild)
}

object NormalizeAlnum {
  /** Static so generated code can call it directly. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toLowerCase.toString
    val n = str.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        // a space is emitted only BETWEEN kept runs — leading/trailing
        // separator runs vanish, which is exactly the trim()
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}
