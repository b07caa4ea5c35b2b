package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Portable Bloom filter over long keys: build with the [[BloomAgg]]
  * aggregator (mergeable bytes → map-side partial aggregation, like the
  * HLL sketch), probe with the codegen'd [[BloomContains]] expression.
  *
  * The scale pattern this powers is the broadcast runtime filter: a
  * selective dimension's keys compress to `m/8` bytes that BROADCAST to
  * every task scanning the big side, discarding non-joining rows at the
  * scan — the explicit, deterministic form of Spark's InjectRuntimeFilter
  * (which only fires under its own thresholds). No false negatives ever,
  * so `bloom-prefilter → exact semi-join` returns exactly the semi-join's
  * rows; false positives only cost the exact join some extra probe rows
  * (rate (1 − e^(−kn/m))^k ≈ 0.24% at k=4, n=4096, m=2^16).
  *
  * Same k-hash family on both sides: h_i(x) = splitmix64(x ⊕ i·φ₆₄) mod m
  * ([[BloomFilterOps.bitOf]]) — deterministic everywhere.
  */
final class BloomAgg(mBits: Int = BloomFilterOps.DefaultBits)
    extends Aggregator[Long, Array[Byte], Array[Byte]] with Serializable {
  require(mBits % 8 == 0 && mBits > 0, s"mBits must be a positive multiple of 8: $mBits")

  // k is deliberately NOT a parameter: the probe side (BloomContains) infers
  // m from the byte length but has no channel for k, so a configurable k
  // here would silently produce false negatives on probe. Build and probe
  // share the one constant.
  private val k = BloomFilterOps.DefaultK

  override def zero: Array[Byte] = new Array[Byte](mBits / 8)

  override def reduce(b: Array[Byte], x: Long): Array[Byte] = {
    var i = 0
    while (i < k) {
      val bit = BloomFilterOps.bitOf(x, i, mBits)
      b(bit >>> 3) = (b(bit >>> 3) | (1 << (bit & 7))).toByte
      i += 1
    }
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(b: Array[Byte]): Array[Byte] = b
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomFilterOps {
  val DefaultBits = 1 << 16 // 8 KiB — broadcast-cheap even × many filters
  val DefaultK = 4

  /** Bit index of hash i for key x — shared by build and probe. */
  def bitOf(x: Long, i: Int, mBits: Int): Int =
    ((HllSketch.mix64(x ^ (i * 0x9e3779b97f4a7c15L)) & Long.MaxValue) % mBits).toInt

  /** Column form: `bloom_of(keys)` in `agg(...)` → filter bytes. */
  def bloom_of(c: Column): Column = udaf(new BloomAgg()).apply(c)
}

/** `might_contain(filterBytes, key)`: true iff all k bits for `key` are set
  * in the filter built by [[BloomAgg]] with the same parameters (m inferred
  * from the byte length). Codegen'd scan-side probe.
  */
case class BloomContains(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(bytes: Any, key: Any): Any =
    BloomContains.contains(bytes.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, x) => s"graft.functions.BloomContains.contains($b, $x)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  /** Static so generated code can call it directly. */
  def contains(bytes: Array[Byte], key: Long): Boolean = {
    val mBits = bytes.length * 8
    var i = 0
    while (i < BloomFilterOps.DefaultK) {
      val bit = BloomFilterOps.bitOf(key, i, mBits)
      if ((bytes(bit >>> 3) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }
}
