package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every registered query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with total + per-query seconds.
  * local[32] with shuffle fan-out matched to cores (not the 200 default —
  * 32 cores × tiny partitions would be all scheduler overhead), AQE on for
  * runtime coalescing/skew handling, same session config the engine
  * standardizes on.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen/IO warmup outside the timed region: one cheap action per table
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      // a failed query must not masquerade as a fast one: record -1
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // ONE compact JSON line, printed LAST (after spark.stop() so no late log
    // line can trail it). The harness captures only the tail of stdout, so
    // the line must stay short as the registry grows: per-query keys are the
    // unique qNN/pNN prefixes (the driver contract's own "q1":sec style) and
    // values are rounded to milliseconds. Full names remain in
    // SparkEntry.queries; prefix → name is a trivial lookup.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    spark.stop()
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
  }
}
