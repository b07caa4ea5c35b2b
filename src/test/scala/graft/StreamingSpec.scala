package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Streaming semantics through real micro-batch execution (MemoryStream →
  * query → memory sink), including watermark-driven late-data drops and
  * event-time session timeout.
  */
class StreamingSpec extends SparkTestBase {

  // offset from epoch 0: a row exactly at the initial watermark (t=0)
  // would be considered late and dropped by stateful operators
  private val Base = 1200000L // multiple of the 60 s window, off epoch 0
  private def ts(s: Long): Timestamp = new Timestamp(Base + s * 1000L)

  test("windowed stats over a stream; late data beyond watermark is dropped") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.windowedStats(input.toDF(), "ts", "10 seconds", "1 minute")
      .writeStream.format("memory").queryName("win").outputMode("append").start()
    try {
      input.addData(
        Event(1, "click", ts(5), 1.0), Event(2, "click", ts(30), 2.0),
        Event(1, "view", ts(65), 3.0))
      q.processAllAvailable()
      // advance watermark far: closes the first windows
      input.addData(Event(9, "click", ts(500), 0.0))
      q.processAllAvailable()
      // a late event for an already-closed window must be dropped
      input.addData(Event(3, "click", ts(10), 99.0))
      q.processAllAvailable()
      input.addData(Event(9, "click", ts(1000), 0.0))
      q.processAllAvailable()
      val rows = s0.table("win").collect()
        .map(r => ((r.getTimestamp(0).getTime - Base) / 1000, r.getString(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(rows.contains((0L, "click", 2L, 3.0)), s"got $rows")   // ts 5 + 30
      assert(rows.contains((60L, "view", 1L, 3.0)), s"got $rows")
      // the late ts(10) click did NOT reopen window 0 with 99.0
      assert(!rows.exists(r => r._1 == 0 && r._4 == 102.0), s"late data leaked: $rows")
    } finally q.stop()
  }

  test("built-in session windows close by gap") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionStats(input.toDF(), "ts", "5 seconds", "30 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: events at 0s and 10s (one session), then 100s (new session)
      input.addData(Event(1, "a", ts(0), 0), Event(1, "b", ts(10), 0), Event(1, "c", ts(100), 0))
      q.processAllAvailable()
      input.addData(Event(2, "z", ts(1000), 0)) // advance watermark, close all
      q.processAllAvailable()
      val rows = s0.table("sess").collect()
        .map(r => (r.getLong(2), (r.getTimestamp(0).getTime - Base) / 1000, r.getLong(3))).toSet
      assert(rows.contains((1L, 0L, 2L)), s"got $rows")
      assert(rows.contains((1L, 100L, 1L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming dedup drops repeats of the key within the watermark") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupedStream(input.toDF(), "ts", "10 seconds", Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(
        Event(1, "click", ts(0), 1.0), Event(1, "click", ts(2), 2.0),
        Event(1, "view", ts(3), 3.0), Event(2, "click", ts(4), 4.0))
      q.processAllAvailable()
      input.addData(Event(1, "click", ts(5), 5.0)) // still within horizon: dup
      q.processAllAvailable()
      val rows = s0.table("dedup").collect()
      assert(rows.length == 3, s"got ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("stream-stream join matches errors within the time window before each click") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val joined = EventStreams.clickErrorJoin(
      clicks.toDF().filter($"event_type" === "click"),
      errors.toDF().filter($"event_type" === "error"),
      watermark = "10 seconds", windowSec = 30)
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      errors.addData(Event(1, "error", ts(10), 0), Event(1, "error", ts(100), 0))
      clicks.addData(Event(1, "click", ts(20), 0), Event(1, "click", ts(90), 0))
      q.processAllAvailable()
      // advance both watermarks so results emit (distinct users so the
      // probe events can't join each other)
      errors.addData(Event(8, "error", ts(500), 0))
      clicks.addData(Event(9, "click", ts(500), 0))
      q.processAllAvailable()
      val rows = s0.table("ssj").collect()
        .map(r => ((r.getTimestamp(1).getTime - Base) / 1000, (r.getTimestamp(2).getTime - Base) / 1000))
        .toSet
      // click@20 matches error@10 (within 30 s before); click@90 matches
      // neither (error@100 is after it, error@10 is 80 s before)
      assert(rows == Set((20L, 10L)), s"got $rows")
    } finally q.stop()
  }

  test("left-outer stream join: a quiet side stalls null emission; its advance releases it") {
    // pins s14's two measured semantics: the join watermark is the MIN
    // over the sides (each tracking only its own rows), and null-padded
    // emission happens at state eviction = watermark − range span
    val s0 = spark
    import s0.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    implicit val sqlCtx = s0.sqlContext
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val c = clicks.toDF().withWatermark("ts", "10 seconds")
      .select($"user_id", $"ts".as("click_ts"))
    val e = errors.toDF().withWatermark("ts", "10 seconds")
      .select($"user_id".as("e_user"), $"ts".as("err_ts"))
    val j = c.join(e,
      col("user_id") === col("e_user")
        && col("err_ts") >= col("click_ts") - expr("INTERVAL 30 SECONDS")
        && col("err_ts") <= col("click_ts"), "left_outer")
      .select(col("user_id"), col("click_ts"), col("err_ts"))
    val q = j.writeStream.format("memory").queryName("ssoj")
      .outputMode("append").start()
    try {
      // u1's click has no matching error; the click side races far ahead
      errors.addData(Event(2, "error", ts(10), 0))
      clicks.addData(Event(1, "click", ts(20), 0), Event(9, "click", ts(500), 0))
      q.processAllAvailable()
      assert(s0.table("ssoj").filter(col("err_ts").isNull).count() == 0,
        "null rows emitted while the error side's watermark was behind")
      // the error side catches up → min watermark 490, eviction 460:
      // click@20 is released null-padded, click@500 stays in state
      errors.addData(Event(8, "error", ts(500), 0))
      q.processAllAvailable()
      val nulls = s0.table("ssoj").filter(col("err_ts").isNull).collect()
        .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - Base) / 1000)).toSet
      assert(nulls == Set((1L, 20L)), s"got $nulls")
    } finally q.stop()
  }

  test("sessionize merges very-late events into one past session (no fragmentation)") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val input = MemoryStream[Event]
    // generous watermark so deliberately-late events still reach the operator
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 5000L, watermark = "600 seconds")
    val q = sessions.writeStream.format("memory").queryName("latemerge").outputMode("append").start()
    try {
      input.addData(Event(1, "a", ts(100), 1.0)) // open session at 100s
      q.processAllAvailable()
      // two very-late events within one gap of each other, far before the
      // open session: must emit as ONE merged past session, and must not
      // fragment the open one
      input.addData(Event(1, "b", ts(10), 2.0), Event(1, "c", ts(12), 3.0))
      q.processAllAvailable()
      // close everything via watermark advance
      input.addData(Event(2, "z", ts(5000), 0.0))
      q.processAllAvailable()
      input.addData(Event(2, "z2", ts(10000), 0.0))
      q.processAllAvailable()
      val rows = s0.table("latemerge").collect()
        .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - Base) / 1000,
          (r.getTimestamp(2).getTime - Base) / 1000, r.getLong(3), r.getDouble(4))).toSet
      assert(rows.contains((1L, 10L, 12L, 2L, 5.0)), s"late pair not merged: $rows")
      assert(rows.contains((1L, 100L, 100L, 1L, 1.0)), s"open session lost: $rows")
      assert(rows.count(_._1 == 1L) == 2, s"fragmented: $rows")
    } finally q.stop()
  }

  test("custom flatMapGroupsWithState sessionization emits on event-time timeout") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 30000L)
    val q = sessions.writeStream.format("memory").queryName("fmgws").outputMode("append").start()
    try {
      input.addData(Event(7, "a", ts(0), 1.5), Event(7, "b", ts(20), 2.5))
      q.processAllAvailable()
      // watermark jump past lastMs+gap → timeout fires, session emits
      input.addData(Event(8, "z", ts(600), 0.0))
      q.processAllAvailable()
      input.addData(Event(8, "z2", ts(1200), 0.0))
      q.processAllAvailable()
      val rows = s0.table("fmgws").collect()
        .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - Base) / 1000,
          (r.getTimestamp(2).getTime - Base) / 1000, r.getLong(3), r.getDouble(4))).toSet
      assert(rows.contains((7L, 0L, 20L, 2L, 4.0)), s"got $rows")
    } finally q.stop()
  }

  test("state-v2 transformWithState sessionization: timer re-arms on extension, fires on expiry") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s0.conf.get(key,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    s0.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val sessions = EventStreams.sessionizeV2(input.toDS(), gapMs = 30000L)
      val q = sessions.writeStream.format("memory").queryName("twsv2")
        .outputMode("append").start()
      try {
        input.addData(Event(7, "a", ts(0), 1.5), Event(7, "b", ts(20), 2.5))
        q.processAllAvailable()
        // watermark at 50s > first horizon (20+30) WOULD fire the original
        // timer — but this batch also EXTENDS the session, so the re-armed
        // timer (40+30) keeps it open and nothing emits
        input.addData(Event(7, "c", ts(40), 4.0), Event(8, "z", ts(60), 0.0))
        q.processAllAvailable()
        assert(s0.table("twsv2").isEmpty,
          "session emitted despite the re-armed timer")
        // watermark past 40+30 → timer fires, the EXTENDED session emits once
        input.addData(Event(8, "z2", ts(600), 0.0))
        q.processAllAvailable()
        val rows = s0.table("twsv2").collect()
          .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - Base) / 1000,
            (r.getTimestamp(2).getTime - Base) / 1000, r.getLong(3), r.getDouble(4))).toSet
        // user 8's session at 60s expires in the same watermark jump
        assert(rows == Set((7L, 0L, 40L, 3L, 8.0), (8L, 60L, 60L, 1L, 0.0)),
          s"got $rows")
      } finally q.stop()
    } finally s0.conf.set(key, prev)
  }

  test("state-v2 seeded bootstrap: initial state merges with early input, quiet seed expires by timer") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s0.conf.get(key,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    s0.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      // seeds: user 1 open [0s..20s] n=2 (will be EXTENDED by stream);
      // user 5 open [0s..5s] n=1 (no stream events — must expire by the
      // pre-armed timer alone)
      val seeds = Seq(
        (1L, EventStreams.SessionBuf(Base, Base + 20000L, 2, 4.0)),
        (5L, EventStreams.SessionBuf(Base, Base + 5000L, 1, 1.0)))
        .toDS().groupByKey(_._1).mapValues(_._2)
      val sessions = EventStreams.sessionizeV2Seeded(input.toDS(), seeds,
        gapMs = 30000L, watermark = "0 seconds")
      val q = sessions.writeStream.format("memory").queryName("seeded")
        .outputMode("append").start()
      try {
        // 40s is within one gap of user 1's seeded lastMs (20s) → extends
        input.addData(Event(1, "a", ts(40), 3.0))
        q.processAllAvailable()
        // advance the watermark far past both horizons
        input.addData(Event(9, "z", ts(600), 0.0))
        q.processAllAvailable()
        input.addData(Event(9, "z2", ts(1200), 0.0))
        q.processAllAvailable()
        val rows = s0.table("seeded").collect()
          .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - Base) / 1000,
            (r.getTimestamp(2).getTime - Base) / 1000, r.getLong(3), r.getDouble(4))).toSet
        assert(rows.contains((1L, 0L, 40L, 3L, 7.0)), s"seed not extended: $rows")
        assert(rows.contains((5L, 0L, 5L, 1L, 1.0)), s"quiet seed lost: $rows")
      } finally q.stop()
    } finally s0.conf.set(key, prev)
  }

  test("dropDuplicatesWithinWatermark: dup inside delay dropped, dup after state eviction re-admitted") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val input = MemoryStream[Event]
    val dedup = input.toDS()
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    val q = dedup.writeStream.format("memory").queryName("ddwm")
      .outputMode("append").start()
    try {
      // first occurrence emits; a same-batch duplicate is dropped
      input.addData(Event(1, "a", ts(0), 1.0), Event(1, "a", ts(5), 2.0))
      q.processAllAvailable()
      // watermark → 90 s: (1,a)'s dedup state (expiry 0+10 s) is evicted
      input.addData(Event(2, "b", ts(100), 0.0))
      q.processAllAvailable()
      // duplicate AFTER eviction: re-admitted (bounded state ⇒ re-emission
      // beyond the delay window — the documented WithinWatermark contract)
      input.addData(Event(1, "a", ts(200), 3.0))
      q.processAllAvailable()
      input.addData(Event(9, "z", ts(600), 0.0))
      q.processAllAvailable()
      val byKey = s0.table("ddwm").collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .groupBy(identity).map { case (k, v) => (k, v.length) }
      assert(byKey((1L, "a")) == 2, s"expected re-admission after eviction: $byKey")
      assert(byKey((2L, "b")) == 1 && byKey((9L, "z")) == 1, byKey.toString)
    } finally q.stop()
  }

  test("state-v2 MapState windows: per-key map holds several open windows, timers close them independently") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s0.conf.get(key,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    s0.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      // 10 s windows, zero-delay watermark: user 1 populates THREE windows
      // in one batch — the MapState must hold all three open at once
      val wins = EventStreams.mapStateWindows(input.toDS(),
        windowMs = 10000L, watermark = "0 seconds")
      val q = wins.writeStream.format("memory").queryName("mapwins")
        .outputMode("append").start()
      try {
        input.addData(
          Event(1, "a", ts(1), 5.0), Event(1, "b", ts(3), 2.0),
          Event(1, "c", ts(11), 7.0), Event(1, "d", ts(25), 1.0))
        q.processAllAvailable()
        // the 40 s row advances the watermark past all three of user 1's
        // window ends within this processAllAvailable — all three emit
        // (independent timers), while user 2's [40,50) stays open
        input.addData(Event(2, "z", ts(40), 0.0))
        q.processAllAvailable()
        val afterFirst = s0.table("mapwins").collect()
          .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - Base) / 1000,
            r.getLong(2), r.getDouble(3))).toSet
        assert(afterFirst == Set((1L, 0L, 2L, 5.0), (1L, 10L, 1L, 7.0),
          (1L, 20L, 1L, 1.0)), s"got $afterFirst")
        // advance far: user 2's [40,50) closes too
        input.addData(Event(3, "y", ts(600), 0.0))
        q.processAllAvailable()
        val all = s0.table("mapwins").collect()
          .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - Base) / 1000,
            r.getLong(2), r.getDouble(3))).toSet
        assert(all == afterFirst + ((2L, 40L, 1L, 0.0)), s"got $all")
      } finally q.stop()
    } finally s0.conf.set(key, prev)
  }

  test("state-v2 ListState top-k: snapshots refine across batches, state truncates to k") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s0.conf.get(key,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    s0.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventStreams.EventIdVal]
      val snaps = EventStreams.listStateTopK(input.toDS())
      val q = snaps.writeStream.format("memory").queryName("topk")
        .outputMode("update").start()
      try {
        // batch 1: four values — the k=3 list must truncate (drop 1.0)
        input.addData(
          EventStreams.EventIdVal(1, 10, 5.0), EventStreams.EventIdVal(1, 11, 1.0),
          EventStreams.EventIdVal(1, 12, 9.0), EventStreams.EventIdVal(1, 13, 5.0))
        q.processAllAvailable()
        val b1 = s0.table("topk").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4))).toSet
        // ties on 5.0 break by event_id: 10 before 13
        assert(b1 == Set((1L, 4L, 9.0, 5.0, 5.0)), s"got $b1")
        // batch 2: 7.0 displaces the second 5.0; 0.5 is ignored. The
        // truncated 1.0 from batch 1 must NOT resurface.
        input.addData(
          EventStreams.EventIdVal(1, 14, 7.0), EventStreams.EventIdVal(1, 15, 0.5))
        q.processAllAvailable()
        val b2 = s0.table("topk").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4))).toSet
        assert(b2 == b1 + ((1L, 6L, 9.0, 7.0, 5.0)), s"got $b2")
      } finally q.stop()
    } finally s0.conf.set(key, prev)
  }

  test("chained stateful aggs: two state stores, rollup closes with its sub-windows") {
    // the s16 shape in miniature: 10 s tumbling counts per type feeding a
    // 60 s rollup (sum + peak) in ONE query — pins that Spark really runs
    // TWO stateful operators and that watermark propagation closes the
    // outer window in the same cascade that evicts its inner windows
    import org.apache.spark.sql.functions._
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx = s0.sqlContext
    val input = MemoryStream[Event]
    val rollup = input.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "10 seconds"), $"event_type")
      .agg(count(lit(1)).as("n10"))
      .groupBy(window(window_time($"window"), "1 minute"), $"event_type")
      .agg(sum($"n10").as("n_min"), max($"n10").as("peak"))
      .select($"window.start".as("w_start"), $"event_type", $"n_min", $"peak")
    val q = rollup.writeStream.format("memory").queryName("chained")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, "click", ts(5), 0), Event(2, "click", ts(8), 0),
        Event(3, "click", ts(15), 0), Event(4, "click", ts(15), 0),
        Event(5, "click", ts(17), 0))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.length == 2,
        s"expected 2 stateful operators, got ${q.lastProgress.stateOperators.length}")
      // nothing may emit before the watermark passes the MINUTE end —
      // even though the 10 s windows are long closed
      input.addData(Event(9, "click", ts(55), 0))
      q.processAllAvailable()
      assert(s0.table("chained").isEmpty, "rollup emitted before its window closed")
      // one event far ahead closes [0,60): both 10 s windows evict into
      // the rollup and the rollup row emits, all in the same cascade
      input.addData(Event(9, "click", ts(300), 0))
      q.processAllAvailable()
      val rows = s0.table("chained").collect()
        .map(r => ((r.getTimestamp(0).getTime - Base) / 1000,
          r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows == Set((0L, "click", 6L, 3L)), s"got $rows")
    } finally q.stop()
  }

  test("Trigger.AvailableNow file stream reproduces the batch result exactly") {
    // batch/stream parity: the SAME aggregation over the SAME parquet must
    // yield identical rows whether executed as one batch plan or through
    // incremental micro-batch state — the invariant that makes the engine's
    // batch oracle meaningful for its streaming mode
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val s0 = spark
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream-par")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sfDir, "documents.parquet"),
      srcDir.resolve("part-0.parquet"))
    val agg: DataFrame => DataFrame = df =>
      df.groupBy(col("source"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
    val batch = agg(s0.read.parquet(srcDir.toString))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val q = agg(s0.readStream.schema(s0.read.parquet(srcDir.toString).schema)
        .parquet(srcDir.toString))
      .writeStream.format("memory").queryName("parity").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query did not finish")
      val streamed = s0.table("parity")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("s35 incremental bucket manifests equal the batch rollup (XOR fold is batching-invariant)") {
    import org.apache.spark.sql.functions._
    val got = QueriesStreaming.all.find(_.name == "s35_stream_bucket_manifest").get
      .fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expect = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"),
        graft.functions.GraftFunctions.poly_hash(
          concat(col("doc_id").cast("string"), lit(":"), col("text"))).as("h"))
      .groupBy(expr("doc_id div 100").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c"), expr("bit_xor(h)").as("x"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("JdbcTxnSink: replayed batch is a no-op, later batch upserts, ledger records both") {
    import graft.sources.JdbcTxnSink
    val root = java.nio.file.Files.createTempDirectory("graft_jdbc_sink_spec")
    val db = root.resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    try {
      JdbcTxnSink.init(url)
      JdbcTxnSink.init(url) // idempotent
      import spark.implicits._
      val b0 = Seq((100L, "click", 2L, 1.5), (200L, "view", 1L, 0.25))
        .toDF("w_sec", "event_type", "n", "sum_value")
      JdbcTxnSink.upsertBatch(url, b0, 0L)
      JdbcTxnSink.upsertBatch(url, b0, 0L) // at-least-once replay: ledger skips
      def table(): Set[(Long, String, Long, Double)] = {
        val c = java.sql.DriverManager.getConnection(url)
        try {
          val rs = c.createStatement()
            .executeQuery("SELECT w_sec, event_type, n, sum_value FROM agg")
          val out = scala.collection.mutable.Set.empty[(Long, String, Long, Double)]
          while (rs.next())
            out += ((rs.getLong(1), rs.getString(2), rs.getLong(3), rs.getDouble(4)))
          out.toSet
        } finally c.close()
      }
      assert(table() == Set((100L, "click", 2L, 1.5), (200L, "view", 1L, 0.25)))
      // batch 1 updates one key, inserts another
      val b1 = Seq((100L, "click", 5L, 9.0), (300L, "error", 1L, 4.0))
        .toDF("w_sec", "event_type", "n", "sum_value")
      JdbcTxnSink.upsertBatch(url, b1, 1L)
      assert(table() == Set((100L, "click", 5L, 9.0), (200L, "view", 1L, 0.25),
        (300L, "error", 1L, 4.0)))
      // a replay of batch 1 with DIFFERENT (stale) values must be skipped
      // by the ledger — this is the crash-between-commits case
      val stale = Seq((100L, "click", 99L, -1.0))
        .toDF("w_sec", "event_type", "n", "sum_value")
      JdbcTxnSink.upsertBatch(url, stale, 1L)
      assert(table().contains((100L, "click", 5L, 9.0)))
    } finally {
      JdbcTxnSink.shutdown(db)
      graft.util.Fs.deleteRecursively(root)
    }
  }
}
