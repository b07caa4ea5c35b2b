ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prestorakamkafkaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver archives only the tail of `sbt -batch "runMain graft.Bench"`
// stdout and parses the LAST line as JSON. sbt's default output strategy
// routes forked stdout through its logger — every line arrives prefixed
// "[info] " and a "[success] Total time…" banner trails the run — which is
// exactly why BENCH_r01–r08 all carry parsed:null. StdoutOutput passes the
// forked process's stdout through raw, and showSuccess drops the banner,
// so Bench's final JSON line IS the final stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — exclude it
// from the unused-key lint so every batch run doesn't print a [warn] block
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32 executor threads in ONE heap: 8g forced G1 into mixed-collection
  // storms once shared caches + shuffle buffers piled up — measured as
  // roaming ~10 s penalties on whichever query was live when the heap
  // filled (different victims every bench run). The box has 128 GiB;
  // give the single-JVM stand-in for a 32-executor cluster a heap that
  // matches its parallelism.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++
  // diagnostic passthrough (e.g. SPARK_GRAFT_JVM_EXTRA="-Xlog:gc*:file=/tmp/gc.log"
  // to correlate bench outliers with collector pauses); empty by default
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
