package graft

/** Ad-hoc plan inspector for SCALING.md / ScaleSpec work:
  * `sbt "Test/runMain graft.PlanDump q65 q66"` prints each query's
  * physical plan at sf0.001.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.session
    val qs = SparkEntry.queries
    args.foreach { prefix =>
      qs.keys.filter(_.startsWith(prefix)).toSeq.sorted.foreach { name =>
        println(s"===== $name")
        println(qs(name)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
