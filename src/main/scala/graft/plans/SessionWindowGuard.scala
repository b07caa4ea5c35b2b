package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, SessionWindow}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}

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
  * Detection matches the analyzer's OWN marker, not the column name:
  * `SessionWindowing` stamps the session attribute's metadata with
  * `SessionWindow.marker` ("spark.sessionWindow"), and `Alias` propagates
  * child metadata — so a user column that merely HAPPENS to be named
  * session_window never trips the guard (r12 ADVICE false positive), a
  * re-aliased session struct (`.as("sw")`) still does, and the
  * Filter→Aggregate exprId link is followed through intervening Projects'
  * alias chains. Filters on non-window grouping keys (e.g. `user_id`)
  * are untouched: pushing those below the aggregate is
  * semantics-preserving (sessions are built per grouping key).
  */
final class SessionWindowEndFilterGuard(spark: SparkSession)
    extends (LogicalPlan => Unit) {

  override def apply(plan: LogicalPlan): Unit = {
    if (!spark.conf
        .get("spark.graft.sessionWindowEndFilterGuard", "true").toBoolean) return
    plan.foreach {
      case Filter(cond, child) =>
        val sessIds: Set[ExprId] =
          cond.references.filter(isSessionAttr).map(_.exprId).toSet
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

  /** The analyzer's SessionWindowing rule stamps the session attribute
    * with this metadata marker; Alias propagates it, so the test survives
    * renames and never matches an ordinary column.
    */
  private def isSessionAttr(a: Attribute): Boolean =
    a.metadata.contains(SessionWindow.marker)

  /** Does the subtree hold a session-window Aggregate that PRODUCES one of
    * `ids`? The filter above references the aggregate's OUTPUT attribute,
    * possibly renamed by intervening Projects — alias chains are followed
    * by remapping each tracked id to the ids its Alias child references.
    */
  private def aggGroupsOnSession(p: LogicalPlan, ids: Set[ExprId]): Boolean = p match {
    case a: Aggregate =>
      a.aggregateExpressions.exists(ne => ids.contains(ne.toAttribute.exprId)) &&
        a.groupingExpressions.exists(_.references.exists(isSessionAttr))
    case proj: Project =>
      val mapped: Set[ExprId] = proj.projectList.flatMap {
        case al: Alias if ids.contains(al.exprId) =>
          al.child.references.map(_.exprId).toSeq
        case ne if ids.contains(ne.toAttribute.exprId) => Seq(ne.toAttribute.exprId)
        case _ => Nil
      }.toSet
      mapped.nonEmpty && proj.children.exists(aggGroupsOnSession(_, mapped))
    case other => other.children.exists(aggGroupsOnSession(_, ids))
  }
}

/** Thrown by [[SessionWindowEndFilterGuard]] — a dedicated type so specs
  * (and users) can distinguish the guard from genuine analysis errors.
  */
final class SessionWindowEndFilterException(msg: String)
    extends RuntimeException(msg)
