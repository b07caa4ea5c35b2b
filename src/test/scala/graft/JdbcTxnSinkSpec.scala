package graft

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.sources.JdbcTxnSink

/** Adversarial-replay property tests for the exactly-once JDBC ledger
  * (round-7 verdict item #5): s33/s34 prove crash-resume on one cut point
  * each; these tests replay `upsertBatch` through every interleaving the
  * at-least-once restart contract can produce — full same-batchId replay,
  * restart over a PARTIAL ledger (some partitions committed before the
  * crash, their agg rows already in the table), and a stale out-of-order
  * replay of an old batch after newer batches committed — asserting the
  * final table is bit-identical to the clean sequential run in all of
  * them. No end-to-end stream run hits these interleavings
  * deterministically; the ledger logic is exercised head-on here.
  */
class JdbcTxnSinkSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("w_sec", LongType), StructField("event_type", StringType),
    StructField("n", LongType), StructField("sum_value", DoubleType)))

  private def df(rows: Seq[(Long, String, Long, Double)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4)), 2),
      schema)

  // batch 0 seeds six keys; batch 1 updates three of them and adds two —
  // overlapping keys are what make stale replays and partial redo visible
  private val b0 = Seq(
    (100L, "click", 5L, 1.5), (100L, "view", 2L, 0.5), (200L, "click", 7L, 2.0),
    (200L, "error", 1L, 9.0), (300L, "view", 4L, 4.0), (300L, "click", 3L, 3.25))
  private val b1 = Seq(
    (100L, "click", 9L, 2.5), (200L, "error", 2L, 11.0), (300L, "view", 6L, 6.5),
    (400L, "click", 1L, 0.25), (400L, "view", 2L, 1.0))
  private val expectedFinal: Set[(Long, String, Long, Double)] =
    (b0.map(r => (r._1, r._2) -> r).toMap ++ b1.map(r => (r._1, r._2) -> r).toMap)
      .values.toSet

  private def freshDb(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ledger_${tag}_")
    // Derby wants to CREATE the db dir itself
    graft.util.Fs.deleteRecursively(dir)
    dir.toString
  }

  private def url(db: String) = s"jdbc:derby:$db;create=true"

  private def tableState(db: String): Set[(Long, String, Long, Double)] = {
    val c = DriverManager.getConnection(url(db))
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT w_sec, event_type, n, sum_value FROM agg")
      val buf = scala.collection.mutable.Set.empty[(Long, String, Long, Double)]
      while (rs.next())
        buf += ((rs.getLong(1), rs.getString(2), rs.getLong(3), rs.getDouble(4)))
      buf.toSet
    } finally { c.close(); JdbcTxnSink.shutdown(db) }
  }

  private def withDb(tag: String)(body: String => Unit): Unit = {
    val db = freshDb(tag)
    try body(db)
    finally {
      JdbcTxnSink.shutdown(db)
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(db))
    }
  }

  test("clean sequential run reaches the expected upserted state") {
    withDb("clean") { db =>
      JdbcTxnSink.init(url(db))
      JdbcTxnSink.upsertBatch(url(db), df(b0), 0L)
      JdbcTxnSink.upsertBatch(url(db), df(b1), 1L)
      assert(tableState(db) === expectedFinal)
    }
  }

  test("full same-batchId replay (every batch delivered twice) is a no-op") {
    withDb("replay") { db =>
      JdbcTxnSink.init(url(db))
      JdbcTxnSink.upsertBatch(url(db), df(b0), 0L)
      JdbcTxnSink.upsertBatch(url(db), df(b0), 0L) // crash after ckpt? redeliver
      JdbcTxnSink.upsertBatch(url(db), df(b1), 1L)
      JdbcTxnSink.upsertBatch(url(db), df(b1), 1L)
      assert(tableState(db) === expectedFinal)
    }
  }

  test("restart over a PARTIAL ledger redoes exactly the uncommitted partitions") {
    // simulate the real crash point: some of batch 0's partition
    // transactions committed (their agg rows AND ledger rows are in),
    // the rest never ran. The restart replays the WHOLE batch; committed
    // partitions must skip via the ledger, the others must apply.
    // Partition ownership is the sink's own deterministic hash
    // repartition, recovered empirically per key so the simulation
    // commits true partition-aligned subsets.
    withDb("partial") { db =>
      JdbcTxnSink.init(url(db))
      val keyToPid: Map[(Long, String), Int] =
        df(b0).repartition(4, col("w_sec"), col("event_type"))
          .rdd.mapPartitionsWithIndex { (pid, it) =>
            it.map(r => ((r.getLong(0), r.getString(1)), pid))
          }.collect().toMap
      val committedPids = keyToPid.values.toSet.take(keyToPid.values.toSet.size / 2 max 1)
      val c = DriverManager.getConnection(url(db))
      try {
        c.setAutoCommit(false)
        val ins = c.prepareStatement(
          "INSERT INTO agg (w_sec, event_type, n, sum_value) VALUES (?, ?, ?, ?)")
        b0.filter(r => committedPids(keyToPid((r._1, r._2)))).foreach { r =>
          ins.setLong(1, r._1); ins.setString(2, r._2)
          ins.setLong(3, r._3); ins.setDouble(4, r._4); ins.executeUpdate()
        }
        ins.close()
        val led = c.prepareStatement(
          "INSERT INTO commits (batch_id, part_id) VALUES (0, ?)")
        committedPids.foreach { p => led.setInt(1, p); led.executeUpdate() }
        led.close()
        c.commit()
      } finally c.close()
      // the restart: full replay of batch 0, then batch 1 as normal
      JdbcTxnSink.upsertBatch(url(db), df(b0), 0L)
      JdbcTxnSink.upsertBatch(url(db), df(b1), 1L)
      assert(tableState(db) === expectedFinal)
    }
  }

  test("stale out-of-order replay of an old committed batch cannot roll back newer values") {
    withDb("stale") { db =>
      JdbcTxnSink.init(url(db))
      JdbcTxnSink.upsertBatch(url(db), df(b0), 0L)
      JdbcTxnSink.upsertBatch(url(db), df(b1), 1L)
      // a zombie re-delivery of batch 0 AFTER batch 1 committed: without
      // the ledger this would overwrite (100,click) back to n=5
      JdbcTxnSink.upsertBatch(url(db), df(b0), 0L)
      assert(tableState(db) === expectedFinal)
    }
  }
}
