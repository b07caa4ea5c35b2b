package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SimHash signature as ONE typed aggregate: per group, fold every shingle
  * hash into `bits` vote counters (+1 if affine hash j lands in the upper
  * half of the modulus, else -1), then pack the vote signs into a long
  * fingerprint.
  *
  * Why an imperative aggregate and not `bits` × `sum(when(...))` columns:
  * the column formulation generates ONE giant codegen'd update method (32
  * aggregate buffers × hash-mix arithmetic) that sits at the JIT's huge-
  * method edge — measured 2-17 s for the same sf0.1 plan depending on
  * whether/when C2 compiled it. This hand-written update loop is a few
  * dozen bytecodes, JIT-compiles immediately, and carries one long-array
  * buffer instead of 32 separate agg slots — the same reason a 100 TB run
  * wants compact aggregation state. Vote arithmetic is identical integer
  * math ((a·h + b) mod p vs half), so results are bit-equal to the column
  * version and to the DuckDB oracle.
  *
  * Merge is element-wise sum — associative/commutative, so Spark plans
  * map-side partial aggregation as usual.
  */
final class SimHashSig(as: Array[Long], bs: Array[Long], mod: Long, half: Long)
    extends Aggregator[Long, Array[Long], Long] with Serializable {

  private val bits = as.length
  require(bits <= 64, s"signature wider than a long: $bits")

  override def zero: Array[Long] = new Array[Long](bits)

  override def reduce(w: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < bits) {
      // as(j), h < mod < 2^30 so the product stays well under 2^63
      w(j) += (if ((as(j) * h + bs(j)) % mod > half) 1L else -1L)
      j += 1
    }
    w
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(w: Array[Long]): Long = {
    var sig = 0L
    var j = 0
    while (j < bits) { if (w(j) > 0L) sig |= 1L << j; j += 1 }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object SimHashSig {

  /** Column form over a long hash column, ready for `agg`. */
  def simhash_sig(h: Column, as: Array[Long], bs: Array[Long],
                  mod: Long, half: Long): Column =
    udaf(new SimHashSig(as, bs, mod, half)).apply(h)
}
