package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** IVF coarse assignment: the ids of the TWO nearest seed centroids by
  * exact-decimal cosine, as `array<long>` `[best, second]` — a native,
  * whole-stage-codegen'd replacement for the interpreted
  * `aggregate(...)` lambda fold (HigherOrderFunctions are not codegen'd;
  * the per-row fold over 16 seeds with struct churn was p14's dominant
  * cost).
  *
  * Semantics are an EXACT twin of the fold it replaces (and of the oracle's
  * `row_number() OVER (ORDER BY score DESC, seed_id)` at rn=1/rn=2):
  * seeds are visited in array order (callers pass a seed_id-sorted array),
  * score = `DotDecimal.dot(v, seed).toDouble / (norm * seedNorm)` — the
  * same decimal-exact dot, the same double division — and strict `>`
  * comparisons keep the FIRST (lowest seed_id) maximum per slot on ties.
  *
  * Children: (seeds `array<struct<seed_id long, se array<double>,
  * sn double>>`, embedding `array<double>`, norm `double`).
  */
case class NearestSeeds(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_seeds"

  override protected def nullSafeEval(seeds: Any, emb: Any, norm: Any): Any =
    NearestSeeds.twoBest(seeds.asInstanceOf[ArrayData], emb.asInstanceOf[ArrayData],
      norm.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, e, n) =>
      s"""
         |${ev.value} = graft.functions.NearestSeeds.twoBest($s, $e, $n);
         |${ev.isNull} = (${ev.value} == null);
         |""".stripMargin)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): NearestSeeds =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestSeeds {
  /** SQL DESC-sort "greater": NaN ranks above every number (Spark's sort
    * and DuckDB's ORDER BY DESC both put NaN first) — Java's `>` would
    * silently skip NaN scores (e.g. a zero-norm vector ⇒ 0/0) and diverge
    * from the window argmax this expression replaces.
    */
  private def sqlGreater(a: Double, b: Double): Boolean =
    a > b || (a.isNaN && !b.isNaN)

  /** Static so generated code can call it directly. Seeds with a
    * length-mismatched vector (null dot) are skipped, like the fold's
    * null-propagating `>` comparison.
    *
    * Filter-and-verify argmax: a first pass scores every seed with the
    * plain IEEE-double dot plus a rigorous bound on its divergence from the
    * exact-decimal score ([[DotDecimal.epsBound]]). When the double ranking
    * separates best/second/third by more than the summed bounds, the exact
    * ranking provably agrees and the ~100× dearer decimal pass is skipped;
    * any ambiguity (or a NaN score) falls back to the exact loop, so the
    * result is bit-identical to always-exact by construction.
    */
  def twoBest(seeds: ArrayData, emb: ArrayData, norm: Double): ArrayData = {
    val n = seeds.numElements()
    // fast pass: track top-3 double scores, their error bounds, and the
    // LARGEST bound over every scored seed — a seed dropped from the top-3
    // still constrains certification (its exact score can exceed its double
    // score by its own eps, which may dwarf the tracked seeds' bounds when
    // its norm is tiny)
    var s1 = Double.NegativeInfinity; var d1 = -1L; var e1 = 0.0
    var s2 = Double.NegativeInfinity; var d2 = -1L; var e2 = 0.0
    var s3 = Double.NegativeInfinity
    var maxEps = 0.0
    var certain = true
    var i = 0
    while (i < n && certain) {
      val seed = seeds.getStruct(i, 3)
      val se = seed.getArray(1)
      if (emb.numElements() == se.numElements()) {
        val dim = emb.numElements()
        var sum = 0.0; var absSum = 0.0
        var j = 0
        while (j < dim) {
          val p = emb.getDouble(j) * se.getDouble(j)
          sum += p; absSum += math.abs(p)
          j += 1
        }
        val div = norm * seed.getDouble(2)
        val score = sum / div
        if (java.lang.Double.isNaN(score)) certain = false // exact path owns NaN ordering
        else {
          val eps = DotDecimal.epsBound(dim, absSum) / math.abs(div) +
            4 * math.ulp(math.abs(score)) // division + toDouble rounding slack
          if (eps > maxEps) maxEps = eps
          if (score > s1) {
            s3 = s2; s2 = s1; d2 = d1; e2 = e1
            s1 = score; d1 = seed.getLong(0); e1 = eps
          } else if (score > s2) {
            s3 = s2
            s2 = score; d2 = seed.getLong(0); e2 = eps
          } else if (score > s3) {
            s3 = score
          }
        }
      }
      i += 1
    }
    // the double ranking is trusted only when exact scores provably rank the
    // same way. (1) s1 vs s2: gap beats their summed bounds. (2) s2 vs the
    // REST: every other seed j has double score ≤ s3 and exact score
    // ≤ s_j + eps_j ≤ s3 + maxEps, so s2 - s3 > e2 + maxEps certifies that
    // no third seed — tracked or dropped — can overtake s2 exactly. (-inf
    // slots — fewer than 3 scorable seeds — leave an infinite gap.)
    if (certain && s1 - s2 > e1 + e2 && s2 - s3 > e2 + maxEps)
      return new GenericArrayData(Array(d1, d2))
    exactTwoBest(seeds, emb, norm)
  }

  private def exactTwoBest(seeds: ArrayData, emb: ArrayData, norm: Double): ArrayData = {
    var s1 = Double.NegativeInfinity; var d1 = -1L
    var s2 = Double.NegativeInfinity; var d2 = -1L
    val n = seeds.numElements()
    var i = 0
    while (i < n) {
      val seed = seeds.getStruct(i, 3)
      val dec = DotDecimal.dot(emb, seed.getArray(1))
      if (dec != null) {
        val score = dec.toDouble / (norm * seed.getDouble(2))
        if (sqlGreater(score, s1)) {
          s2 = s1; d2 = d1
          s1 = score; d1 = seed.getLong(0)
        } else if (sqlGreater(score, s2)) {
          s2 = score; d2 = seed.getLong(0)
        }
      }
      i += 1
    }
    new GenericArrayData(Array(d1, d2))
  }
}
