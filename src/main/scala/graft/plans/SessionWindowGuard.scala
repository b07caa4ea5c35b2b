package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.ExprId
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}

/** Analysis-time guard for the session_window end-filter pushdown hazard
  * (caught by the streaming differential fuzzer's first session plan,
  * seed 303; verdict r11 #3 asked for this pin).
  *
  * The hazard: a `.filter` on `session_window.end` (or `.start`, or the
  * whole struct) over a session aggregate's OUTPUT references only
  * grouping columns, so Catalyst's PushDownPredicates legally moves it
  * BELOW the Aggregate — where the `session_window` column is still the
  * per-event PROTO-session `[ts, ts + gap)`; gap-merging happens inside
  * the aggregate. The pushed predicate drops individual events whose
  * proto-session crosses the threshold and silently RESHAPES merged
  * sessions (observed: three one-event "sessions" the un-filtered plan
  * had correctly merged away). Tumbling/hopping `window()` is immune —
  * its pre-aggregation value already IS the final window.
  *
  * No registry entry builds this shape (the registry's session_window
  * uses are streaming-side with no post-agg end filter), so rather than
  * silently producing wrong sessions for a future batch entry or user
  * query, this check rule FAILS LOUDLY on the analyzed shape
  * Filter-referencing-session_window above an Aggregate grouping on that
  * same session_window attribute, and names the two correct forms:
  * materialize a pushdown barrier (`df.localCheckpoint()`) before the
  * filter, or threshold driver-side after collecting. Disable with
  * `spark.graft.sessionWindowEndFilterGuard=false` (the regression spec
  * does, to pin the underlying Catalyst behavior itself).
  *
  * Detection is conservative by exprId: an intervening Project that
  * re-aliases the struct breaks the match — acceptable for a guard whose
  * job is catching the NATURAL way to write the query, not adversarial
  * variants. Filters on non-window grouping keys (e.g. `user_id`) are
  * untouched: pushing those below the aggregate is semantics-preserving
  * (sessions are built per grouping key).
  */
final class SessionWindowEndFilterGuard(spark: SparkSession)
    extends (LogicalPlan => Unit) {

  override def apply(plan: LogicalPlan): Unit = {
    if (!spark.conf
        .get("spark.graft.sessionWindowEndFilterGuard", "true").toBoolean) return
    plan.foreach {
      case Filter(cond, child) =>
        val sessIds: Set[ExprId] =
          cond.references.filter(_.name == "session_window").map(_.exprId).toSet
        if (sessIds.nonEmpty && aggGroupsOnSession(child, sessIds))
          throw new SessionWindowEndFilterException(
            "filter on session_window start/end above a session-window " +
              "aggregate: Catalyst pushes grouping-column predicates below " +
              "the Aggregate, where session_window is still the per-event " +
              "proto-session [ts, ts+gap) — the filter would silently " +
              "reshape merged sessions. Materialize a barrier first " +
              "(df.localCheckpoint()) or threshold driver-side; set " +
              "spark.graft.sessionWindowEndFilterGuard=false to override.")
      case _ => ()
    }
  }

  /** Does the subtree hold a session-window Aggregate that PRODUCES one of
    * `ids`? The filter above references the aggregate's OUTPUT attribute,
    * which may be a fresh exprId aliasing the grouping attribute
    * (`session_window#x AS session_window#y`), so the match is: some
    * aggregate output whose attribute is in `ids`, on an Aggregate whose
    * grouping references a `session_window` attribute.
    */
  private def aggGroupsOnSession(p: LogicalPlan, ids: Set[ExprId]): Boolean =
    p.collectFirst {
      case a: Aggregate
        if a.aggregateExpressions.exists(ne => ids.contains(ne.toAttribute.exprId)) &&
           a.groupingExpressions.exists(
             _.references.exists(_.name == "session_window")) => true
    }.isDefined
}

/** Thrown by [[SessionWindowEndFilterGuard]] — a dedicated type so specs
  * (and users) can distinguish the guard from genuine analysis errors.
  */
final class SessionWindowEndFilterException(msg: String)
    extends RuntimeException(msg)
