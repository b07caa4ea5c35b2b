package graft

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.catalog.SystemColumns
import graft.functions.{AvroSchemas, GraftFunctions => GF}
import graft.plans.{OffsetRange, OffsetRangePlanner}
import graft.sources.{EventSource, KafkaEventSink, ParquetEventSource}

class EngineWiringSpec extends SparkTestBase {

  /** Stub source recording the pruned ranges the engine hands it. */
  private final class RecordingSource(inner: EventSource) extends EventSource {
    var ranges: Seq[OffsetRange] = OffsetRangePlanner.Full
    override def read(spark: SparkSession, project: String, collection: String,
                      schema: StructType): DataFrame =
      inner.read(spark, project, collection, schema)
    override def withOffsetRanges(rs: Seq[OffsetRange]): EventSource = {
      ranges = rs; this
    }
  }

  test("engine.offsetWindow plans pruned ranges into the source and filters residually") {
    val base = GraftEngine.overFixtures(spark, sfDir)
    val rec = new RecordingSource(ParquetEventSource(sfDir))
    val eng = new GraftEngine(spark, base.metastore, rec)
    val df = eng.offsetWindow("tpch", "events",
      col("_offset") >= 100 && col("_offset") < 500 && col("event_type") === "click")
    // the offset bounds reached the source; the event_type conjunct widened nothing
    assert(rec.ranges == Seq(OffsetRange(100, Some(500))))
    // residual filter still applied on top
    val rows = df.select(col("_offset"), col("event_type")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) >= 100 && r.getLong(0) < 500 && r.getString(1) == "click"))
  }

  test("register exposes <project>_<collection> to spark.sql without system columns") {
    val eng = GraftEngine.overFixtures(spark, sfDir)
    eng.register("tpch", "events")
    val out = spark.sql(
      "SELECT event_type, count(*) AS n FROM tpch_events GROUP BY event_type")
    assert(out.count() > 0)
    intercept[Exception](spark.sql("SELECT _offset FROM tpch_events").collect())
  }

  test("engine.sql caches registration on metastore generation") {
    import graft.catalog.{InMemoryMetastore, Metastore, SchemaField}
    final class CountingMetastore(inner: InMemoryMetastore) extends Metastore {
      var schemaLookups = 0
      var listCalls = 0
      override def getCollection(p: String, c: String): Option[Seq[SchemaField]] = {
        schemaLookups += 1; inner.getCollection(p, c)
      }
      override def listProjects: Seq[String] = { listCalls += 1; inner.listProjects }
      override def listCollections(p: String): Seq[String] = inner.listCollections(p)
      override def generation: Long = inner.generation
    }
    val inner = new InMemoryMetastore
    val ordersSchema = Tables.load(spark, sfDir, "orders").schema
    inner.createCollection("genproj", "orders", SchemaField.fromStructType(ordersSchema))
    val ms = new CountingMetastore(inner)
    val eng = new GraftEngine(spark, ms, ParquetEventSource(sfDir))

    assert(eng.sql("SELECT count(*) AS n FROM genproj_orders").head().getLong(0) > 0)
    val afterFirst = (ms.schemaLookups, ms.listCalls)
    assert(afterFirst._1 > 0 && afterFirst._2 > 0)

    // unchanged generation: second query does NO metastore work at all
    eng.sql("SELECT count(*) AS n FROM genproj_orders").head()
    assert((ms.schemaLookups, ms.listCalls) == afterFirst)

    // a new collection bumps the generation -> re-registration picks it up
    inner.createCollection("genproj", "customer",
      SchemaField.fromStructType(Tables.load(spark, sfDir, "customer").schema))
    assert(eng.sql("SELECT count(*) AS n FROM genproj_customer").head().getLong(0) > 0)
    assert(ms.schemaLookups > afterFirst._1 && ms.listCalls > afterFirst._2)
  }

  test("KafkaEventSink shapes (topic, 8-byte big-endian key, avro value)") {
    val s0 = spark
    import s0.implicits._
    val df = Seq((1L, "click", 2.5), (-2L, "view", 0.0)).toDF("event_id", "event_type", "value")
    val shaped = KafkaEventSink.toKafkaFrame(df, "proj", "events", "event_id")
    assert(shaped.columns.toSeq == Seq("topic", "key", "value"))
    val rows = shaped.collect()
    assert(rows.forall(_.getString(0) == "proj_events"))
    val keys = rows.map(r => ByteBuffer.wrap(r.getAs[Array[Byte]](1)).getLong).toSet
    assert(keys == Set(1L, -2L))
    assert(rows.forall(_.getAs[Array[Byte]](1).length == 8)) // NumberEncoder parity
    // values decode back under the collection schema
    val payloadSchema = df.drop("event_id").schema
    val avro = AvroSchemas.toAvro(payloadSchema, "events").toString
    val back = shaped.select(GF.from_avro(col("value"), avro).as("e")).select("e.*")
    assert(back.collect().map(_.getString(0)).toSet == Set("click", "view"))
  }

  test("engine.sql discovers collections from the metastore and queries them") {
    val eng = GraftEngine.overFixtures(spark, sfDir)
    val out = eng.sql(
      """SELECT e.event_type, count(*) AS n
        |FROM tpch_events e JOIN tpch_customer c ON e.user_id % 100 = c.c_custkey % 100
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)
    assert(out.count() > 0)
  }

  test("exact counts across many input partitions (TestManySegments invariant)") {
    // the reference proved split-boundary correctness by exact count over
    // many tiny segments (TestManySegments.java:102-108); analogue: same
    // count regardless of partitioning
    val ev = Tables.load(spark, sfDir, "events")
    val n1 = ev.count()
    assert(ev.repartition(64).count() == n1)
    assert(SystemColumns.names.nonEmpty && n1 > 0)
  }
}
