package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{BloomAgg, BloomContains, BloomFilterOps, GraftFunctions => GF}

class BloomFilterSpec extends SparkTestBase {

  test("no false negatives ever; false-positive rate stays near theory (property)") {
    val agg = new BloomAgg()
    val prop = Prop.forAll(Gen.listOfN(200, Gen.choose(Long.MinValue, Long.MaxValue))) { keys =>
      val filter = keys.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      keys.forall(BloomContains.contains(filter, _))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
    // fp-rate sanity at the p26 design point: n=4096 inserted, probe 100k
    // absent keys; (1 − e^(−kn/m))^k ≈ 0.24% for k=4, m=2^16 — allow 3x
    val filter = (0L until 4096L).foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    val fps = (1000000L until 1100000L).count(BloomContains.contains(filter, _))
    assert(fps < 100000 * 0.0072, s"fp rate ${fps / 100000.0} vs theory 0.0024")
  }

  test("merge is a lossless union (partial aggregation safety)") {
    val agg = new BloomAgg()
    val left = (0L until 500L).foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    val right = (500L until 1000L).foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    val merged = agg.merge(left, right)
    assert((0L until 1000L).forall(BloomContains.contains(merged, _)))
  }

  test("bloom_of + bloomContains agree end-to-end in a plan") {
    import spark.implicits._
    val keys = spark.range(100).select((col("id") * 17).as("k"))
    val bloom = keys.agg(BloomFilterOps.bloom_of(col("k")).as("bf"))
    val probed = spark.range(2000).select(col("id").as("x"))
      .crossJoin(broadcast(bloom))
      .filter(GF.bloomContains(col("bf"), col("x")))
      .select(col("x")).as[Long].collect().toSet
    val members = (0L until 100L).map(_ * 17).filter(_ < 2000).toSet
    assert(members.subsetOf(probed), "false negative through the plan path")
    // any extras are false positives; at these sizes there should be ~none
    assert((probed -- members).size <= 5, s"extras: ${(probed -- members).take(10)}")
  }
}
