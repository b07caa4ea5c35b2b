package graft.sources

import org.apache.spark.sql.DataFrame

/** The publish step of a corpus pipeline: write the cleaned corpus as
  * partitioned parquet so downstream consumers read only the slices they
  * ask for (partition pruning at the scan — `PartitionFilters` in the
  * plan, pinned in FileSourceSpec). At 100 TB the partition column is the
  * coarse selector (language, source, date); optional bucketing on the
  * join key (see ScaleSpec's bucketed-index test) co-locates downstream
  * joins. Overwrite is idempotent re-publish — reruns converge to the
  * same layout.
  */
object CorpusSink {

  def publish(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
