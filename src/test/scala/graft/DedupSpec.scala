package graft

import org.apache.spark.sql.Row

import graft.operators.Dedup

class DedupSpec extends SparkTestBase {

  private def cc(pairs: (Long, Long)*): Map[Long, (Long, Boolean)] = {
    val s0 = spark
    import s0.implicits._
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect()
      .map { case Row(id: Long, keeper: Long, kept: Boolean) => id -> (keeper, kept) }
      .toMap
  }

  test("chains collapse into one component with the min id as keeper") {
    // 1-2, 2-3, 3-4: no direct 1-4 pair, but all one component
    val r = cc((1L, 2L), (2L, 3L), (3L, 4L))
    assert(r == Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false), 4L -> (1L, false)))
  }

  test("disjoint components keep independent keepers") {
    val r = cc((10L, 11L), (20L, 21L), (21L, 22L))
    assert(r(10L) == (10L, true) && r(11L) == (10L, false))
    assert(r(20L) == (20L, true) && r(21L) == (20L, false) && r(22L) == (20L, false))
  }

  test("cycles, reversed pairs and duplicate edges are harmless") {
    val r = cc((3L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    assert(r == Map(1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false)))
  }

  test("a long path converges (diameter > 1 forces multiple rounds)") {
    val path = (0L until 12L).sliding(2).map(w => (w(1), w(0))).toSeq
    val r = cc(path: _*)
    assert(r.size == 12 && r.forall { case (_, (k, _)) => k == 0L })
    assert(r.count { case (_, (_, kept)) => kept } == 1)
  }

  test("exactly one keeper per component (kept count == component count)") {
    val r = cc((1L, 2L), (4L, 3L), (7L, 8L), (8L, 9L), (2L, 1L))
    assert(r.count { case (_, (_, kept)) => kept } == 3)
  }

  private def ccStar(pairs: Seq[(Long, Long)]): Map[Long, (Long, Boolean)] = {
    val s0 = spark
    import s0.implicits._
    Dedup.connectedComponentsStar(pairs.toDF("id_a", "id_b"))
      .collect()
      .map { case Row(id: Long, keeper: Long, kept: Boolean) => id -> (keeper, kept) }
      .toMap
  }

  test("large-star/small-star variant equals min-propagation on random graphs (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEdges = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield edges
    val prop = Prop.forAll(genEdges) { edges =>
      // self-loop-only inputs still register their ids; both impls must
      // agree on the FULL (id -> keeper, kept) map
      ccStar(edges) == cc(edges: _*)
    }
    // few but heavy cases: each check runs two iterative Spark jobs
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("large-star/small-star collapses a long chain (the case it exists for)") {
    val path = (0L until 24L).sliding(2).map(w => (w(1), w(0))).toSeq
    val r = ccStar(path)
    assert(r.size == 24 && r.forall { case (_, (k, _)) => k == 0L })
    assert(r.count { case (_, (_, kept)) => kept } == 1)
  }
}
