package graft

import org.apache.spark.sql.functions._

import graft.functions.HllSketch

class HllSketchSpec extends SparkTestBase {

  test("estimate within HLL error bounds at several cardinalities") {
    val hll = new HllSketch(12) // σ ≈ 1.04/√4096 ≈ 1.6%
    for (n <- Seq(100, 5000, 200000)) {
      val sketch = (0 until n).foldLeft(hll.zero)((b, i) => hll.reduce(b, i.toLong * 2654435761L))
      val est = hll.finish(sketch).toDouble
      assert(math.abs(est - n) / n < 0.05, s"n=$n est=$est")
    }
  }

  test("sketches merge losslessly: sketch(A ∪ B) == merge(sketch A, sketch B)") {
    val hll = new HllSketch(10)
    val a = (0 until 1000).foldLeft(hll.zero)((b, i) => hll.reduce(b, i.toLong))
    val b = (500 until 1500).foldLeft(hll.zero)((b0, i) => hll.reduce(b0, i.toLong))
    val union = (0 until 1500).foldLeft(hll.zero)((b0, i) => hll.reduce(b0, i.toLong))
    assert(hll.merge(a.clone(), b).toSeq == union.toSeq) // bytewise identical
  }

  test("runs distributed as a groupBy UDAF and tracks exact distinct") {
    val ev = Tables.load(spark, sfDir, "events")
    val got = ev.groupBy(col("event_type"))
      .agg(HllSketch.hll_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact < 0.1,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }
}
