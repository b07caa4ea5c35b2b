package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Differential-test runner: read a JSON object of {name: sql} (shared
  * Spark/DuckDB dialect), run each statement against the registered fixture
  * views, dump one parquet dir per query. `tools/fuzz_oracle.py` generates
  * the queries and replays them in DuckDB for comparison — randomized
  * cross-engine testing beyond the hand-written suite.
  */
object RunSql {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, queryFile, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // minimal JSON object parser for {"name": "sql", ...} with escaped strings
    val text = Files.readString(Paths.get(queryFile))
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    def unescape(s: String): String = s
      .replace("\\n", "\n").replace("\\t", "\t").replace("\\\"", "\"").replace("\\\\", "\\")
    entry.findAllMatchIn(text).foreach { m =>
      val (name, sql) = (unescape(m.group(1)), unescape(m.group(2)))
      try spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[runsql] $name failed: ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
