package graft.catalog

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.plans.{OffsetRange, OffsetRangePlanner}
import graft.sources.{EventSource, KafkaEventSource}

/** DSv2 table for an offset-addressed event LOG: `_offset` predicates from
  * ANY `spark.sql` query are pushed into the scan as pruned
  * [[OffsetRange]]s — the reference got this for free on every SQL query
  * from Presto's TupleDomain (`KafkaSplitManager.java:93-106`); here
  * [[GraftLogScanBuilder.pushFilters]] is that hook, with
  * [[OffsetRangePlanner]] as the filter→range translator.
  *
  * Execution follows Spark's own JDBC-connector pattern: the built scan is a
  * [[V1Scan]] whose relation delegates to the collection's [[EventSource]]
  * specialized to the pruned ranges (Kafka reads only those windows;
  * columnar files get the ranges re-applied as an `_offset` residual that
  * Catalyst pushes into the file scan). Every accepted filter is ALSO kept
  * as a Spark-side residual, so pruning can only ever drop rows the
  * predicate excludes (the planner's sound over-approximation).
  */
final class GraftLogTable(
    tableName: String,
    project: String,
    collection: String,
    userSchema: StructType,
    source: EventSource)
    extends Table with SupportsRead {

  private val fullSchema = StructType(SystemColumns.fields ++ userSchema.fields)

  override def name(): String = tableName
  override def schema(): StructType = fullSchema
  override def capabilities(): util.Set[TableCapability] =
    if (source.supportsMicroBatch)
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLogScanBuilder(project, collection, userSchema, fullSchema, source)

  /** The table's read at full schema, pruned to `ranges`, as a DataFrame —
    * what [[graft.plans.InlineLogScan]] splices into query plans in place of
    * this relation. Same construction as the scan path: pruned source read,
    * offset-range residual, full-schema projection.
    */
  def innerFrame(spark: org.apache.spark.sql.classic.SparkSession,
                 ranges: Seq[OffsetRange]): org.apache.spark.sql.DataFrame = {
    val full = source.withOffsetRanges(ranges).read(spark, project, collection, userSchema)
    val pruned =
      if (ranges == OffsetRangePlanner.Full) full
      else full.filter(KafkaEventSource.rangeResidual(col(SystemColumns.Offset), ranges))
    pruned.select(fullSchema.fieldNames.map(col).toSeq: _*)
  }
}

final class GraftLogScanBuilder(
    project: String,
    collection: String,
    userSchema: StructType,
    fullSchema: StructType,
    source: EventSource)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = fullSchema
  private var ranges: Seq[OffsetRange] = OffsetRangePlanner.Full
  private var accepted: Array[Filter] = Array.empty

  /** Translate an `_offset`-only DSv2 filter into a [[Column]] predicate the
    * [[OffsetRangePlanner]] understands; `None` = not an offset filter (or a
    * shape the planner can't prune) — it stays a plain residual.
    */
  private def toColumn(f: Filter): Option[Column] = {
    val off = col(SystemColumns.Offset)
    // integral values only: a fractional literal truncated via longValue()
    // would prune UNDER-inclusively (LessThan(_offset, 2.5) -> [0,2) drops
    // offset 2) — exactly the unsoundness the planner's cast guard exists
    // to prevent. Non-integral shapes fall through to the plain residual.
    def num(v: Any): Option[Long] = v match {
      case n: java.lang.Long => Some(n.longValue())
      case n: java.lang.Integer => Some(n.longValue())
      case n: java.lang.Short => Some(n.longValue())
      case n: java.lang.Byte => Some(n.longValue())
      case d: java.math.BigDecimal if d.stripTrailingZeros.scale <= 0 =>
        try Some(d.longValueExact()) catch { case _: ArithmeticException => None }
      case _ => None
    }
    f match {
      case sources.EqualTo(SystemColumns.Offset, v) => num(v).map(off === lit(_))
      case sources.GreaterThan(SystemColumns.Offset, v) => num(v).map(off > lit(_))
      case sources.GreaterThanOrEqual(SystemColumns.Offset, v) => num(v).map(off >= lit(_))
      case sources.LessThan(SystemColumns.Offset, v) => num(v).map(off < lit(_))
      case sources.LessThanOrEqual(SystemColumns.Offset, v) => num(v).map(off <= lit(_))
      case sources.In(SystemColumns.Offset, vs) =>
        val ls = vs.toSeq.map(num)
        // the CONVERTED longs must feed isin — raw values (e.g. integral
        // BigDecimals) would wrap _offset in a decimal cast the planner
        // conservatively refuses, silently disabling the pruning this
        // branch just claimed via pushedFilters()
        if (ls.nonEmpty && ls.forall(_.isDefined)) Some(off.isin(ls.flatten: _*))
        else None
      case sources.And(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
      case sources.Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
      case _ => None
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val spark = org.apache.spark.sql.classic.SparkSession.active
    val translated = filters.map(f => f -> toColumn(f)).collect { case (f, Some(c)) => (f, c) }
    accepted = translated.map(_._1)
    if (translated.nonEmpty) {
      // one analysis pass over a relation exposing _offset resolves casts,
      // then the planner extracts and normalizes the ranges
      val dummy = spark.range(1).select(col("id").as(SystemColumns.Offset))
      ranges = OffsetRangePlanner.fromPredicate(dummy, translated.map(_._2).reduce(_ && _))
    }
    // EVERYTHING stays a Spark-side residual: range extraction prunes the
    // scan but the engine never claims exactness to the optimizer
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(required: StructType): Unit = {
    // empty required schema (e.g. COUNT(*)) still needs SOME column to count
    requiredSchema = required
  }

  override def build(): Scan =
    new GraftLogScan(project, collection, userSchema, requiredSchema, ranges, source)
}

final class GraftLogScan(
    project: String,
    collection: String,
    userSchema: StructType,
    requiredSchema: StructType,
    ranges: Seq[OffsetRange],
    source: EventSource)
    extends V1Scan {

  override def readSchema(): StructType = requiredSchema

  override def description(): String =
    s"GraftLogScan $project.$collection ranges=${rangesString}"

  /** Micro-batch streaming half of the scan (MICRO_BATCH_READ, advertised
    * only when the [[EventSource]] supports it): the source wraps ITS raw
    * connector stream with the reader-level decode pipeline — see
    * [[graft.sources.LogMicroBatchStream]]. The pruned ranges travel into
    * the stream as a residual (streaming scans get no pushFilters pass, so
    * this is normally [[OffsetRangePlanner.Full]]; a caller-side `_offset`
    * filter still evaluates on the decoded rows).
    */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val spark = org.apache.spark.sql.classic.SparkSession.active
    source.microBatchStream(spark, project, collection, userSchema,
      requiredSchema, ranges, checkpointLocation)
  }

  private def rangesString: String =
    ranges.map(r => s"[${r.start},${r.end.map(_.toString).getOrElse("∞")})").mkString(",")

  /** The scan AS a DataFrame: the pruned source read, the offset-range
    * residual, and the required-column projection. Both execution paths run
    * exactly this frame — [[graft.plans.InlineLogScan]] splices its LOGICAL
    * plan into the query (native codegen/AQE; the preferred path), and the
    * [[V1Scan]] bridge below compiles it to an RDD (fallback for sessions
    * without GraftExtensions).
    */
  def innerFrame(spark: org.apache.spark.sql.classic.SparkSession): org.apache.spark.sql.DataFrame = {
    val full = source.withOffsetRanges(ranges)
      .read(spark, project, collection, userSchema)
    // ranges re-applied as an _offset residual: offset-addressed sources
    // already pruned at the broker; columnar sources get this predicate
    // pushed into the file scan by Catalyst (via the offset-column alias)
    val pruned =
      if (ranges == OffsetRangePlanner.Full) full
      else full.filter(KafkaEventSource.rangeResidual(col(SystemColumns.Offset), ranges))
    if (requiredSchema.isEmpty) pruned.select()
    else pruned.select(requiredSchema.fieldNames.map(col).toSeq: _*)
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T = {
    val scan = this
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = requiredSchema
      override def toString: String =
        s"GraftLog ${project}.${collection} ranges=${scan.rangesString}"
      override def buildScan(): RDD[Row] = {
        val spark = context.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        scan.innerFrame(spark).asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].rdd
      }
    }.asInstanceOf[T]
  }
}
