package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.OffsetRange
import graft.sources.{FakeKafka, JsonPayloadCodec, KafkaEventSource}

/** Drives the FULL [[KafkaEventSource.read]] path — offset-JSON handoff,
  * per-range union, minPartitions splitting, decode, malformed-drop —
  * against the broker-free [[FakeKafka]] DSv2 source. Reproduces the
  * reference's exact-count-across-many-splits invariant
  * (`TestManySegments.java:102-108`: many segments/splits must neither lose
  * nor duplicate a single row).
  */
class FakeKafkaSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true)))

  private def source(ranges: Seq[OffsetRange],
                     minParts: Option[Int] = Some(400),
                     corruptEvery: Long = 0L) =
    KafkaEventSource("fake:9092",
      codec = JsonPayloadCodec,
      offsetRanges = ranges,
      partitionsOf = _ => 4,
      minPartitions = minParts,
      extraOptions = Map(
        "fake.latest" -> "25000",
        "fake.partitions" -> "4") ++
        (if (corruptEvery > 0) Map("fake.corruptEvery" -> corruptEvery.toString) else Map.empty),
      format = "graft.sources.FakeKafka")

  test("TestManySegments invariant: 100k rows exact across hundreds of splits") {
    val df = source(Seq(OffsetRange(0, None))).read(spark, "proj", "events", schema)
    // minPartitions=400 over 4 partitions -> 100 chunks each = 400 splits
    assert(df.rdd.getNumPartitions >= 400)
    // exact count: no split loses or duplicates rows
    assert(df.count() == 100000L)
    assert(df.agg(countDistinct(col("user_id"))).head().getLong(0) == 100000L)
    // offsets span the full log on every partition
    val Array(mn, mx) = df.agg(min(col("_offset")), max(col("_offset"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    assert(mn == 0L && mx == 24999L)
  }

  test("multi-range window reads as a union of per-range scans, exactly") {
    val ranges = Seq(OffsetRange(1000, Some(3000)), OffsetRange(5000, Some(6000)))
    val df = source(ranges, minParts = Some(16)).read(spark, "proj", "events", schema)
    assert(df.count() == (2000L + 1000L) * 4)
    // no row outside the requested windows (gap offsets excluded)
    assert(df.filter(col("_offset") >= 3000 && col("_offset") < 5000).count() == 0)
    assert(df.filter(col("_offset") < 1000 || col("_offset") >= 6000).count() == 0)
  }

  test("contradictory predicate (no ranges) yields an empty typed relation") {
    val df = source(Nil).read(spark, "proj", "events", schema)
    assert(df.columns.toSeq == Seq("_offset", "project", "collection", "user_id", "event_type"))
    assert(df.count() == 0)
  }

  test("unbounded-high range clamps to the live log head (latest)") {
    val df = source(Seq(OffsetRange(24990, None)), minParts = None)
      .read(spark, "proj", "events", schema)
    assert(df.count() == 10L * 4)
  }

  test("malformed payloads drop without poisoning the scan (C6 semantics)") {
    val df = source(Seq(OffsetRange(0, None)), corruptEvery = 100L)
      .read(spark, "proj", "events", schema)
    // offsets divisible by 100 are garbage: 250 per partition x 4
    assert(df.count() == 100000L - 250L * 4)
  }

  test("readStream delivers exactly the multi-range window (residual filter end-to-end)") {
    // the broker only receives the coarse start offset; the decoded stream
    // must re-apply the pruned ranges so gaps and the tail are excluded
    val ranges = Seq(OffsetRange(100, Some(200)), OffsetRange(500, Some(600)))
    val df = source(ranges, minParts = None)
      .readStream(spark, "proj", "events", schema)
    val q = df.writeStream.format("memory").queryName("fkstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT _offset, user_id FROM fkstream").collect()
      val offsets = rows.map(_.getLong(0)).toSet
      assert(offsets == ((100L until 200L) ++ (500L until 600L)).toSet)
      // every offset appears once per partition
      assert(rows.length == 200 * 4)
    } finally q.stop()
  }

  test("readStream advances across micro-batches as the log head grows") {
    val src = KafkaEventSource("fake:9092",
      codec = JsonPayloadCodec,
      offsetRanges = Seq(OffsetRange(0, None)),
      partitionsOf = _ => 2,
      extraOptions = Map(
        "fake.partitions" -> "2",
        "fake.latest" -> "50",
        "fake.advancePerBatch" -> "50",
        "fake.maxLatest" -> "150"),
      format = "graft.sources.FakeKafka")
    val df = src.readStream(spark, "proj", "events", schema)
    val q = df.writeStream.format("memory").queryName("fkgrow")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM fkgrow").head().getLong(0)
      // head reaches maxLatest=150 after enough batches: 150 offsets x 2
      assert(n == 300L)
    } finally q.stop()
  }

  test("micro-batch stream never regresses past a checkpointed offset on restart") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val opts = new CaseInsensitiveStringMap(java.util.Map.of(
      "subscribe", "t", "fake.partitions", "1",
      "fake.latest", "50", "fake.advancePerBatch", "50", "fake.maxLatest", "150"))
    val restarted = new graft.sources.FakeKafkaMicroBatchStream("t", opts)
    // the engine restores the committed offset through deserializeOffset —
    // a fresh instance must adopt it instead of re-announcing head=50
    restarted.deserializeOffset("""{"0":150}""")
    val latest = restarted.latestOffset().json()
    assert(latest == """{"0":150}""", latest)
    // and a maxLatest below the restored offset must not shrink it either
    val shrunk = new graft.sources.FakeKafkaMicroBatchStream("t", opts)
    shrunk.commit(shrunk.deserializeOffset("""{"0":400}"""))
    assert(shrunk.latestOffset().json() == """{"0":400}""")
  }

  test("DSv2 readStream.table decodes at the reader and matches the batch scan") {
    val tag = "fkdsv2"
    val msDir = s"/tmp/graft_ms_spec_$tag"
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(msDir))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType)))
    new graft.catalog.FileMetastore(msDir).createCollection("proj", "events",
      graft.catalog.SchemaField.fromStructType(schema))
    val cat = s"graftspec_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.metastore", msDir)
    spark.conf.set(s"spark.sql.catalog.$cat.source", "kafka")
    spark.conf.set(s"spark.sql.catalog.$cat.bootstrap", "fake:9092")
    spark.conf.set(s"spark.sql.catalog.$cat.codec", "json")
    spark.conf.set(s"spark.sql.catalog.$cat.sourceFormat", "graft.sources.FakeKafka")
    spark.conf.set(s"spark.sql.catalog.$cat.sourcePartitions", "2")
    spark.conf.set(s"spark.sql.catalog.$cat.source.option.fake.partitions", "2")
    spark.conf.set(s"spark.sql.catalog.$cat.source.option.fake.latest", "100")
    spark.conf.set(s"spark.sql.catalog.$cat.source.option.fake.corruptEvery", "10")
    val q = spark.readStream.table(s"$cat.proj.events")
      .writeStream.format("memory").queryName("fkdsv2").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT _offset, user_id, event_type FROM fkdsv2 ORDER BY _offset, user_id")
        .collect().toSeq
      // batch twin over the same closed-form log
      val batch = KafkaEventSource("fake:9092", codec = JsonPayloadCodec,
        partitionsOf = _ => 2,
        extraOptions = Map("fake.partitions" -> "2", "fake.latest" -> "100",
          "fake.corruptEvery" -> "10"),
        format = "graft.sources.FakeKafka")
        .read(spark, "proj", "events", schema)
        .selectExpr("_offset", "user_id", "event_type")
        .orderBy("_offset", "user_id").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"stream/batch divergence: ${streamed.size} vs ${batch.size} rows")
      // malformed payloads (offset % 10 == 0) dropped in-flight: 90 x 2
      assert(streamed.size == 180, s"${streamed.size}")
    } finally q.stop()
  }

  test("offset JSON parser handles per-partition maps and keyword forms") {
    assert(FakeKafka.parseOffsetJson("""{"t":{"0":100,"1":200}}""", "t")
      == Some(Map(0 -> 100L, 1 -> 200L)))
    assert(FakeKafka.parseOffsetJson("latest", "t").isEmpty)
    assert(FakeKafka.parseOffsetJson("""{"other":{"0":1}}""", "t") == Some(Map.empty))
  }
}
