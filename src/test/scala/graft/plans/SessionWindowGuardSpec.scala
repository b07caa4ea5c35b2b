package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the session_window end-filter pushdown hazard end-to-end
  * (verdict r11 #3): (1) the guard fails loudly on the hazardous shape,
  * (2) with the guard disabled, CURRENT Catalyst really does push the
  * end-filter below the session aggregate and reshapes merged sessions —
  * if a future Spark version stops doing that, this test fails and the
  * guard can be retired, (3) the two documented correct forms and the
  * legitimate non-window post-agg filters stay un-guarded.
  *
  * Fixture: one user, events at t=0 and t=10 min, gap 15 min → ONE merged
  * session [0, 25 min). A post-agg filter `end <= 20 min` must therefore
  * return ZERO sessions. Pushed below the aggregate it evaluates against
  * per-event proto-sessions [ts, ts+15m): the t=10 event (proto end 25m)
  * is dropped, the surviving t=0 event re-sessionizes alone to [0, 15m),
  * which passes the filter — one phantom session the merged result never
  * contained.
  */
class SessionWindowGuardSpec extends SparkTestBase {

  private val guardKey = "spark.graft.sessionWindowEndFilterGuard"

  private def eventsDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"))
    ).toDF("user_id", "ts")
  }

  private def sessions(df: DataFrame): DataFrame = df
    .groupBy(session_window(col("ts"), "15 minutes"), col("user_id"))
    .agg(count(lit(1)).as("n"))

  private val cutoff = Timestamp.valueOf("2024-01-01 00:20:00")

  test("guard fails loudly on a post-agg session_window.end filter") {
    // the check rule runs at ANALYSIS time — the .filter call itself throws
    val e = intercept[Exception] {
      sessions(eventsDf)
        .filter(col("session_window.end") <= lit(cutoff))
        .collect()
    }
    def rootMsg(t: Throwable): String =
      (Option(t.getMessage).getOrElse("")) +
        Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(e).contains("proto-session"),
      s"expected the guard's message, got: ${rootMsg(e).take(300)}")
  }

  test("pinned Catalyst behavior: pushed end-filter reshapes merged sessions") {
    spark.conf.set(guardKey, "false")
    try {
      val pushed = sessions(eventsDf)
        .filter(col("session_window.end") <= lit(cutoff))
        .collect()
      // CURRENT Spark: the filter lands below the Aggregate, the t=10
      // event is dropped pre-merge, and a phantom one-event session
      // [00:00, 00:15) emits. If this assertion ever fails with an empty
      // result, Catalyst has stopped pushing the predicate — re-evaluate
      // whether SessionWindowEndFilterGuard is still needed.
      assert(pushed.length == 1 && pushed.head.getAs[Long]("n") == 1L,
        s"expected the phantom 1-event session, got ${pushed.mkString("; ")}")
    } finally spark.conf.set(guardKey, "true")
  }

  test("correct forms: barrier before the filter, or driver-side threshold") {
    // localCheckpoint materializes the aggregate — nothing to push through
    val barriered = sessions(eventsDf).localCheckpoint()
      .filter(col("session_window.end") <= lit(cutoff))
      .collect()
    assert(barriered.isEmpty, s"barriered filter must see the MERGED " +
      s"session [00:00,00:25) and drop it, got ${barriered.mkString("; ")}")
    // driver-side threshold over the collected aggregate (the fuzzer twin's
    // discipline, StreamFuzz.runTwin)
    val all = sessions(eventsDf).collect()
    assert(all.length == 1)
    val kept = all.filter(_.getStruct(0)
      .getAs[Timestamp]("end").getTime <= cutoff.getTime)
    assert(kept.isEmpty)
  }

  test("no false positive on a user column merely NAMED session_window") {
    // the guard matches the analyzer's SessionWindow.marker metadata, not
    // the attribute name (r12 ADVICE): a plain column named session_window,
    // grouped and filtered post-agg, is semantically safe and must pass
    val renamed = eventsDf.withColumn("session_window", col("user_id"))
      .groupBy(col("session_window"))
      .agg(count(lit(1)).as("n"))
      .filter(col("session_window") === 1L)
      .collect()
    assert(renamed.length == 1 && renamed.head.getAs[Long]("n") == 2L,
      s"got ${renamed.mkString("; ")}")
  }

  test("guard follows a re-aliasing Project (the documented evasion)") {
    // metadata rides Alias, and aggGroupsOnSession remaps exprIds through
    // Projects — renaming the struct no longer slips past the guard
    val e = intercept[Exception] {
      sessions(eventsDf)
        .select(col("session_window").as("sw"), col("n"))
        .filter(col("sw.end") <= lit(cutoff))
        .collect()
    }
    def rootMsg(t: Throwable): String =
      (Option(t.getMessage).getOrElse("")) +
        Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(e).contains("proto-session"),
      s"expected the guard's message, got: ${rootMsg(e).take(300)}")
  }

  test("guard ignores legitimate shapes") {
    // non-window grouping-key filter post-agg: pushdown is
    // semantics-preserving (sessions are per key), must not trip
    val byKey = sessions(eventsDf).filter(col("user_id") === 1L).collect()
    assert(byKey.length == 1 && byKey.head.getAs[Long]("n") == 2L)
    // tumbling window() end-filter: immune by construction (pre-agg value
    // IS the final window), must not trip; both events land in
    // [00:00, 00:15), whose end passes the 00:20 cutoff
    val tumbling = eventsDf
      .groupBy(window(col("ts"), "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("window.end") <= lit(cutoff))
      .collect()
    assert(tumbling.length == 1 && tumbling.head.getAs[Long]("n") == 2L,
      s"got ${tumbling.mkString("; ")}")
  }
}
