package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.{SchemaField, InMemoryMetastore}
import graft.sources.FileEventSource

class FileSourceSpec extends SparkTestBase {

  private lazy val root = {
    // derive json/csv variants of the fixture events table (no synthesis:
    // same rows, different wire format)
    val dir = Files.createTempDirectory("graft-files").toString
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.coalesce(1).write.json(s"$dir/events.json")
    ev.coalesce(1).write.option("header", "true").csv(s"$dir/events.csv")
    ev.coalesce(1).write.orc(s"$dir/events.orc")
    dir
  }

  private def engine(format: String) = {
    val ms = new InMemoryMetastore
    val st = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value")).schema
    ms.createCollection("tpch", "events", SchemaField.fromStructType(st))
    new GraftEngine(spark, ms, FileEventSource(root, format))
  }

  test("json event source: schema-driven read, system columns, same rows as parquet") {
    val df = engine("json").tableWithSystemColumns("tpch", "events")
    assert(df.columns.take(3).toSeq == Seq("_offset", "project", "collection"))
    val expected = Tables.load(spark, sfDir, "events").count()
    assert(df.count() == expected)
    assert(df.filter(col("_offset") =!= col("event_id")).count() == 0)
  }

  test("csv event source reads the same rows") {
    val df = engine("csv").table("tpch", "events")
    val expected = Tables.load(spark, sfDir, "events")
      .agg(sum("user_id"), count(lit(1))).head()
    val got = df.agg(sum("user_id"), count(lit(1))).head()
    assert(got == expected)
  }

  test("orc event source reads the same rows") {
    val df = engine("orc").table("tpch", "events")
    val expected = Tables.load(spark, sfDir, "events")
      .agg(sum("user_id"), count(lit(1))).head()
    val got = df.agg(sum("user_id"), count(lit(1))).head()
    assert(got == expected)
  }

  test("malformed json rows drop (C6 parity)") {
    val dir = Files.createTempDirectory("graft-badjson")
    Files.writeString(dir.resolve("events.json"),
      """{"event_id": 1, "user_id": 2, "event_type": "click", "value": 1.5}
        |this is not json
        |{"event_id": 3, "user_id": 4, "event_type": "view", "value": 2.5}
        |""".stripMargin)
    val ms = new InMemoryMetastore
    ms.createCollection("p", "events", SchemaField.fromStructType(
      Tables.load(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value")).schema))
    val df = new GraftEngine(spark, ms, FileEventSource(dir.toString, "json"))
      .table("p", "events")
    assert(df.count() == 2)
  }

  test("CorpusSink publish: partitioned layout round-trips and prunes partitions at the scan") {
    import graft.sources.CorpusSink
    val out = Files.createTempDirectory("graft-publish").toString + "/corpus"
    val docs = Tables.load(spark, sfDir, "documents")
    CorpusSink.publish(docs, out, Seq("lang"))
    val back = spark.read.parquet(out)
    // round trip: nothing lost or duplicated, per-language counts intact
    assert(back.count() == docs.count())
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val en = back.filter(col("lang") === "en")
    assert(en.count() == perLang("en"))
    // the language filter must prune PARTITIONS (directory-level skip),
    // not run as a row filter over the full corpus
    val p = en.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"), p)
    assert(!p.contains("PushedFilters: [IsNotNull(lang"), p)
  }
}
