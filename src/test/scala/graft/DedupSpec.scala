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
}
