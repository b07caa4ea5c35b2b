package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Restores the SQL-standard grand-total row on EMPTY input for grouping
  * sets.
  *
  * Standard SQL (and DuckDB/Postgres) says `GROUP BY GROUPING SETS (..., ())`
  * — and therefore every ROLLUP/CUBE, which imply the `()` set — produces
  * one row for the grand-total set even when the input (after WHERE) is
  * empty: `count(*)` = 0, other aggregates their empty-input values, group
  * keys NULL. Spark's Expand-based rewrite yields ZERO rows instead (the
  * Expand emits nothing, so the grouped Aggregate emits nothing) — a
  * divergence this repo's oracle fuzzer found (seed 9999; see
  * `tools/fuzz_oracle.py gen_grouping_query`) and previously had to
  * normalize away with `HAVING count(*) > 0`.
  *
  * The fix unions the Aggregate+Expand plan with a guarded fallback:
  *
  * {{{
  * Union
  * ├─ Aggregate(keys + gid, aggs, Expand(projs, child))   -- unchanged
  * └─ Project(drop probe)
  *    └─ Filter(probe == 0)                                -- emit iff empty
  *       └─ Aggregate(global, aggs[key→NULL, gid→allOnes] + count(1) probe,
  *                    child)
  * }}}
  *
  * The global aggregate always emits exactly one row; the `count(1) == 0`
  * guard keeps it ONLY when the child had no rows — precisely when the
  * grand-total row is missing from the Expand branch. Group-key references
  * become typed NULL literals and the grouping-id column the all-ones
  * literal, so `grouping()` / `grouping_id()` projections stay correct.
  * Aggregate-function arguments need no care: the row only survives on
  * empty input, where every aggregate returns its empty-input value
  * regardless of its argument expression.
  *
  * OPT-IN via `spark.graft.sqlStandardGroupingSets=true`: the fallback adds
  * a second (global, map-side-collapsing) aggregation pass over the child,
  * which at 100 TB is a real cost to pay for a standards corner; engines
  * that want ANSI parity flip the flag per session.
  *
  * Injected as a post-hoc resolution rule (runs ONCE, after
  * ResolveGroupingAnalytics has produced the Aggregate+Expand shape), so no
  * idempotence marker is needed.
  */
object StandardGroupingSets {
  /** Marks an Aggregate this rule already wrapped (survives plan copies). */
  val Rewritten = org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graftGrandTotalRewritten")
}

final class StandardGroupingSets(session: SparkSession) extends Rule[LogicalPlan] {

  private val Flag = "spark.graft.sqlStandardGroupingSets"
  private val GidName = "spark_grouping_id"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get(Flag, "false").equalsIgnoreCase("true")) return plan
    // resolveOperatorsUp (not transformUp): subtrees from an earlier
    // analysis run are marked analyzed and must be skipped — a parquet/
    // insert command re-analyzes the embedded query, and re-firing there
    // would stack a second fallback branch per run. The tag is belt and
    // braces for paths that copy plans without the analyzed marker.
    plan.resolveOperatorsUp {
      case agg @ Aggregate(groupingExprs, aggExprs, expand: Expand, _)
          if agg.getTagValue(StandardGroupingSets.Rewritten).isEmpty &&
            gidOf(groupingExprs).isDefined && hasGrandTotal(groupingExprs, expand) =>
        agg.setTagValue(StandardGroupingSets.Rewritten, ())
        val gid = gidOf(groupingExprs).get
        val k = groupingExprs.length - 1
        val allOnes = (1L << k) - 1
        // grouping-copy attributes sit between the child part and the gid in
        // the Expand output; map each (and the gid) to its fallback literal
        val groupAttrs = expand.output.dropRight(1).takeRight(k)
        val subst: Map[ExprId, Expression] =
          groupAttrs.map(a => a.exprId -> Literal.create(null, a.dataType)).toMap +
            (gid.exprId -> Literal(allOnes, LongType))
        val fallbackAggs: Seq[NamedExpression] = aggExprs.map { ne =>
          val rewritten = ne.transform {
            case a: AttributeReference if subst.contains(a.exprId) => subst(a.exprId)
          }
          rewritten match {
            case n: NamedExpression => n
            case other => Alias(other, ne.name)()
          }
        }
        val probe = Alias(
          AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
          "graft_gt_probe")()
        val global = Aggregate(Nil, fallbackAggs :+ probe, expand.child)
        val probeAttr = global.output.last
        val guarded = Project(global.output.dropRight(1),
          Filter(EqualTo(probeAttr, Literal(0L)), global))
        Union(Seq(agg, guarded))
    }
  }

  private def gidOf(groupingExprs: Seq[Expression]): Option[AttributeReference] =
    groupingExprs.collectFirst {
      case a: AttributeReference if a.name == GidName => a
    }

  /** Does any Expand projection encode the `()` grouping set (gid literal =
    * all ones)? Without it the standard also emits no row on empty input.
    */
  private def hasGrandTotal(groupingExprs: Seq[Expression], expand: Expand): Boolean = {
    val allOnes = (1L << (groupingExprs.length - 1)) - 1
    expand.projections.exists(_.lastOption.exists {
      case Literal(v: Long, LongType) => v == allOnes
      case _ => false
    })
  }
}
