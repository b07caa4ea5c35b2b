package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog distinct-count sketch as a typed `Aggregator[Long, bytes,
  * Long]` — the custom-UDAF machinery of SURVEY §2.2 ("Aggregator for a
  * portable sketch format"). `approx_count_distinct` already provides HLL++
  * natively (q18); this sketch adds what the builtin can't: a **portable,
  * mergeable binary buffer** — store per-day sketches, union them later,
  * ship them between jobs — the Rakam-style pre-aggregated event-analytics
  * pattern.
  *
  * Design: 2^p byte registers; splitmix64 finalizer as the hash (full
  * 64-bit avalanche, deterministic everywhere); standard bias-corrected
  * estimate with linear-counting fallback for the small range. Merge is
  * element-wise max — associative/commutative, so Spark's partial
  * aggregation (map-side combine) applies and sketch bytes from different
  * jobs union losslessly.
  */
final class HllSketch(p: Int = 12) extends Aggregator[Long, Array[Byte], Long]
    with Serializable {
  require(p >= 4 && p <= 16, s"precision out of range: $p")

  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(b: Array[Byte], x: Long): Array[Byte] = {
    val h = HllSketch.mix64(x)
    val idx = (h >>> (64 - p)).toInt
    // rank = leading-zero run in the remaining 64-p bits, + 1
    val rest = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (p - 1))) + 1).toByte
    if (rank > b(idx)) b(idx) = rank
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(b: Array[Byte]): Long = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -b(i).toDouble)
      if (b(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HllSketch {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Column form: `hll_distinct(col)` usable in `agg(...)`. */
  def hll_distinct(c: Column, p: Int = 12): Column = udaf(new HllSketch(p)).apply(c)
}
