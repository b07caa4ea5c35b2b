package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** DSv2 [[MicroBatchStream]] for an offset-addressed log table: wraps the
  * underlying raw source's stream (Kafka's own connector in production,
  * [[FakeKafka]] in the sandbox — both expose the same 7-column raw frame)
  * and decodes each raw record to the table's schema at the reader via a
  * [[RowPipeline]] compiled from the SAME DataFrame decode the batch scan
  * runs.
  *
  * Offset bookkeeping (initial/latest/deserialize/commit) is delegated
  * verbatim to the inner stream — the wrapper adds no state of its own, so
  * checkpoint recovery and exactly-once replay are the inner connector's
  * guarantees, unchanged. Partition planning is delegated too: one decoded
  * partition per raw partition, preserving the inner source's parallelism
  * and locality at any executor count.
  */
final class LogMicroBatchStream(
    inner: MicroBatchStream,
    pipeline: Seq[RowPipeline.Stage])
    extends MicroBatchStream {

  override def initialOffset(): Offset = inner.initialOffset()
  override def latestOffset(): Offset = inner.latestOffset()
  override def deserializeOffset(json: String): Offset = inner.deserializeOffset(json)
  override def commit(end: Offset): Unit = inner.commit(end)
  override def stop(): Unit = inner.stop()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    inner.planInputPartitions(start, end)

  override def createReaderFactory(): PartitionReaderFactory =
    DecodingReaderFactory(inner.createReaderFactory(), pipeline)
}

/** Wraps the raw source's reader factory; each reader pulls raw rows and
  * streams them through the compiled decode pipeline, dropping rows the
  * pipeline filters out (malformed payloads, offset-window residuals).
  */
final case class DecodingReaderFactory(
    inner: PartitionReaderFactory,
    pipeline: Seq[RowPipeline.Stage])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val raw = inner.createReader(partition)
    val eval = new RowPipeline.Eval(pipeline)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (raw.next()) {
          val out = eval(raw.get())
          if (out != null) { current = out; return true }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = raw.close()
    }
  }
}
