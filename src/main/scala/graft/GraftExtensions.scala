package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.plans.{PruneAvroDecode, StandardGroupingSets}

/** Session extensions installing the engine's custom planner pieces.
  * Register with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PruneAvroDecode)
    ext.injectPostHocResolutionRule(s => new StandardGroupingSets(s))
  }
}
