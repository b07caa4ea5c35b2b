package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.plans.{InlineLogScan, PruneAvroDecode, StandardGroupingSets}

/** Session extensions installing the engine's custom planner pieces.
  * Register with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PruneAvroDecode)
    ext.injectPostHocResolutionRule(s => new StandardGroupingSets(s))
    // pre-CBO (right after V2ScanRelationPushDown): replace GraftLogScan's
    // V1-bridge execution with the inner logical plan — native codegen/AQE
    ext.injectPreCBORule(s => InlineLogScan(s))
  }
}
