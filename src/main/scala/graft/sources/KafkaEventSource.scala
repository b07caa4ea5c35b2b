package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.catalog.SystemColumns
import graft.functions.{AvroSchemas, GraftFunctions => GF}
import graft.plans.{OffsetRange, OffsetRangePlanner}

/** Payload codec: Kafka `value` bytes → typed struct (null on malformed).
  * The reference's live path decoded Avro (`KafkaConnectorPageSource.java:298`)
  * while its test harness produced JSON (`EmbeddedKafka.java:135`,
  * `JsonEncoder.java:34-43`); the rebuild supports both behind one interface.
  */
sealed trait PayloadCodec {
  def decode(value: Column, schema: StructType): Column
}

/** Avro with metastore writer schema; projection pushdown via
  * [[graft.plans.PruneAvroDecode]] once only some fields are referenced.
  */
case object AvroPayloadCodec extends PayloadCodec {
  override def decode(value: Column, schema: StructType): Column =
    GF.from_avro(value, AvroSchemas.toAvro(schema).toString)
}

/** JSON. PERMISSIVE `from_json` yields an all-null struct (not null) on
  * malformed input, which would be indistinguishable from a legitimate
  * all-null record — so a corrupt-record marker column distinguishes them
  * and malformed rows decode to a null struct (drop semantics).
  */
case object JsonPayloadCodec extends PayloadCodec {
  private val Corrupt = "_graft_corrupt"
  override def decode(value: Column, schema: StructType): Column = {
    val aug = schema.add(Corrupt, org.apache.spark.sql.types.StringType)
    val parsed = from_json(value.cast("string"), aug,
      Map("columnNameOfCorruptRecord" -> Corrupt))
    when(parsed.getField(Corrupt).isNull, parsed.dropFields(Corrupt))
      .otherwise(lit(null).cast(schema))
  }
}

/** Kafka batch source over `<project>_<collection>` topics (reference
  * C2–C8). Spark's Kafka connector supplies partition discovery, replica
  * failover, locality and fetch/retry (reference C2/C4/C5/O4/O6 — all
  * engine-side now); this class contributes what the reference's connector
  * actually owned:
  *
  *  - offset windows: pruned [[OffsetRange]]s (from
  *    [[OffsetRangePlanner.fromPredicate]]) become `startingOffsets` /
  *    `endingOffsets` JSON — the C3 pushdown. Multi-range windows read as a
  *    union of per-range scans (correctly, unlike the reference's
  *    overlapping-slot bug).
  *  - segment-granular parallelism (O3): `minPartitions` splits partitions
  *    by offset range, Spark's analogue of one-split-per-log-segment.
  *  - codec decode with schema resolution + malformed-row drop (C6) and
  *    hidden system-column synthesis (C7).
  *  - buffer/timeout knobs default to the reference's
  *    (`KafkaConnectorPageSource.java:62` 1 MB fetch,
  *    `KafkaConnectorConfig.java:44-49` 64 KB socket / 10 s connect).
  *
  * Requires `spark-sql-kafka-0-10` on the cluster classpath (not bundled
  * here); everything around the `format("kafka")` call is broker-free and
  * unit-tested via [[KafkaEventSource.decodeRaw]].
  */
final case class KafkaEventSource(
    bootstrapServers: String,
    codec: PayloadCodec = AvroPayloadCodec,
    offsetRanges: Seq[OffsetRange] = OffsetRangePlanner.Full,
    partitionsOf: String => Int = _ => 1,
    minPartitions: Option[Int] = None,
    extraOptions: Map[String, String] = Map.empty,
    // the batch source format; production default is Spark's Kafka
    // connector, tests swap in [[FakeKafka]] to drive the FULL read path
    // (per-range union, offset JSON, minPartitions) without a broker
    format: String = "kafka")
    extends EventSource {

  override def withOffsetRanges(ranges: Seq[OffsetRange]): EventSource =
    copy(offsetRanges = ranges)

  /** Source options for one pruned offset range of a topic. */
  def readOptions(topic: String, range: OffsetRange): Map[String, String] = {
    val (startJson, endJson) =
      OffsetRangePlanner.kafkaOffsetJson(topic, partitionsOf(topic), range)
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startJson,
      "endingOffsets" -> endJson,
      // reference parity: 1 MB fetch, 64 KB socket buffer, 10 s connect
      "kafka.fetch.max.bytes" -> "1000000",
      "kafka.receive.buffer.bytes" -> "65536",
      "kafka.request.timeout.ms" -> "10000",
      "failOnDataLoss" -> "false") ++
      minPartitions.map("minPartitions" -> _.toString) ++
      extraOptions
  }

  override def read(spark: SparkSession, project: String, collection: String,
                    schema: StructType): DataFrame = {
    val topic = SystemColumns.topicFor(project, collection)
    if (offsetRanges.isEmpty) {
      // contradictory predicate pruned everything — empty relation, not a crash
      val full = StructType(SystemColumns.fields ++ schema.fields)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    } else {
      val raw = offsetRanges
        .map(r => spark.read.format(format).options(readOptions(topic, r)).load())
        .reduce(_ unionAll _)
      KafkaEventSource.decodeRaw(raw, project, collection, schema, codec)
    }
  }

  /** Structured-Streaming variant (the extension the reference never had —
    * its "streaming" was repeated batch over the log, SURVEY.md §1.1):
    * unbounded read from the first pruned range's start; feed the result to
    * [[graft.streaming.EventStreams]] windows/sessionization.
    *
    * The broker is only told the coarse start offset (streams have no
    * `endingOffsets`), so the raw stream is a superset of a multi-range
    * window; the pruned ranges are re-applied as a residual `_offset` filter
    * on the decoded stream so callers see exactly the predicate's rows —
    * gaps between ranges and offsets past the last bounded range are
    * excluded, matching the batch `read()` semantics.
    */
  def readStream(spark: SparkSession, project: String, collection: String,
                 schema: StructType): DataFrame = {
    val topic = SystemColumns.topicFor(project, collection)
    // batch read() returns an empty relation for Nil ranges; the streaming
    // analogue would be "everything from 0", the OPPOSITE — refuse loudly
    require(offsetRanges.nonEmpty,
      s"predicate prunes every offset of $topic - nothing to stream")
    val start = offsetRanges.head
    val opts = readOptions(topic, OffsetRange(start.start, None)) - "endingOffsets"
    val raw = spark.readStream.format(format).options(opts).load()
    val decoded = KafkaEventSource.decodeRaw(raw, project, collection, schema, codec)
    decoded.filter(KafkaEventSource.rangeResidual(col(SystemColumns.Offset), offsetRanges))
  }

  override def supportsMicroBatch: Boolean = true

  /** DSv2 micro-batch stream (the [[graft.catalog.GraftLogTable]] streaming
    * path — `spark.readStream.table("graft.<project>.<collection>")`):
    * obtain the RAW source's own [[MicroBatchStream]] from its
    * `TableProvider` (the Kafka connector in production, [[FakeKafka]] in
    * tests — same options [[readOptions]] builds for `readStream`), then
    * wrap it in a [[LogMicroBatchStream]] that decodes at the reader via
    * the [[RowPipeline]] compiled from the SAME `decodeRaw` + residual +
    * projection DataFrame the engine-API streaming path declares. Offset
    * checkpointing is the inner connector's, untouched.
    */
  override def microBatchStream(spark: SparkSession, project: String, collection: String,
                                schema: StructType,
                                requiredSchema: StructType,
                                ranges: Seq[OffsetRange],
                                checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    import scala.jdk.CollectionConverters._
    val topic = SystemColumns.topicFor(project, collection)
    val effective = if (ranges.nonEmpty) ranges else OffsetRangePlanner.Full
    // streams have no endingOffsets: tell the broker the coarse start, keep
    // the pruned multi-range window as a residual in the decode pipeline
    // (identical to readStream's contract)
    val opts = readOptions(topic, OffsetRange(effective.head.start, None)) - "endingOffsets"
    val providerClass = org.apache.spark.sql.execution.datasources.DataSource
      .lookupDataSource(format, spark.sessionState.conf)
    val provider = providerClass.getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableProvider]
    val optMap = new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts.asJava)
    val rawTable = provider.getTable(provider.inferSchema(optMap),
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      optMap.asCaseSensitiveMap())
    val innerStream = rawTable.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(optMap).build()
      .toMicroBatchStream(s"$checkpointLocation/raw")

    // the decode as a DataFrame over a dummy raw-frame relation — analyzed
    // once on the driver, compiled to per-row projections on executors
    val rawDummy = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), FakeKafka.frameSchema)
    val decoded = KafkaEventSource.decodeRaw(rawDummy, project, collection, schema, codec)
    val windowed =
      if (effective == OffsetRangePlanner.Full) decoded
      else decoded.filter(KafkaEventSource.rangeResidual(col(SystemColumns.Offset), effective))
    val projected =
      if (requiredSchema.isEmpty) windowed.select()
      else windowed.select(requiredSchema.fieldNames.map(col).toIndexedSeq: _*)
    new LogMicroBatchStream(innerStream, RowPipeline.compile(projected))
  }
}

object KafkaEventSource {

  /** `_offset ∈ ranges` as a Column predicate — the residual filter that
    * makes a superset scan (e.g. an unbounded stream) honor a multi-range
    * pruned window exactly.
    */
  def rangeResidual(offset: Column, ranges: Seq[OffsetRange]): Column =
    ranges
      .map(r => r.end.fold(offset >= r.start)(e => offset >= r.start && offset < e))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** Kafka-shaped rows (`value` binary, `offset` long) → the engine's table
    * shape: system columns first, decoded user fields after, malformed rows
    * dropped (reference `KafkaConnectorPageSource.java:300-307`).
    */
  def decodeRaw(raw: DataFrame, project: String, collection: String,
                schema: StructType, codec: PayloadCodec): DataFrame = {
    val decoded = raw.select(
      col("offset").cast("long").as(SystemColumns.Offset),
      lit(project).as(SystemColumns.Project),
      lit(collection).as(SystemColumns.Collection),
      codec.decode(col("value"), schema).as("__event"))
    decoded
      .filter(col("__event").isNotNull)
      .select(
        (SystemColumns.fields.map(f => col(f.name)) :+ col("__event.*")): _*)
  }
}
