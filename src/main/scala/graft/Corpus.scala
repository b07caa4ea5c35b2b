package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived dedup corpora. The fixture `documents`/`embeddings` tables carry
  * no duplicates (synthetic word-soup, all texts distinct), so dedup
  * operators exercise a corpus derived from them with *planted* duplicates:
  * exact copies and near-copies (suffix-truncated text). The DuckDB oracle
  * replays the identical derivation as a CTE ([[docsSql]]/[[vecsSql]]), so
  * results stay bit-checkable.
  *
  * Id spacing: planted copies live at +1_000_000 (near) and +2_000_000
  * (exact) so provenance is readable off the id.
  */
object Corpus {

  val NearIdOffset = 1000000L
  val ExactIdOffset = 2000000L

  /** documents ∪ near-copies (doc_id%5=0, last 3 words dropped) ∪ exact
    * copies (doc_id%7=0).
    */
  def docs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    val toks = split(col("text"), " ")
    val near = d.filter(col("doc_id") % 5 === 0).select(
      (col("doc_id") + NearIdOffset).as("doc_id"),
      // greatest(...,0): a ≤3-token doc must yield empty, not a negative-
      // length slice error (fixture min is 10 tokens, but don't rely on it)
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 3, lit(0)))).as("text"))
    val exact = d.filter(col("doc_id") % 7 === 0).select(
      (col("doc_id") + ExactIdOffset).as("doc_id"), col("text"))
    d.unionAll(near).unionAll(exact)
  }

  /** DuckDB CTE body computing the identical corpus (list slicing is
    * 1-based inclusive in DuckDB; `len-3` keeps all but the last 3 tokens,
    * same as Spark's `slice(toks, 1, size-3)`).
    */
  val docsSql: String =
    s"""SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id + $NearIdOffset AS doc_id,
              array_to_string(list_slice(string_split(text, ' '), 1, greatest(len(string_split(text, ' ')) - 3, 0)), ' ') AS text
       FROM documents WHERE doc_id % 5 = 0
       UNION ALL
       SELECT doc_id + $ExactIdOffset AS doc_id, text
       FROM documents WHERE doc_id % 7 = 0"""

  /** embeddings ∪ exact copies (vec_id%10=0, cosine-1 planted pairs) ∪
    * near copies (vec_id%10=5, coordinate 0 scaled by 1.1 → cos ≈ 0.9999
    * but NOT bit-identical — the recall probe for the similarity family:
    * a merely-close pair can land in a different LSH bucket, which is
    * exactly what multi-probe must recover).
    */
  def vecs(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val dup = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + ExactIdOffset).as("vec_id"), col("embedding"))
    val near = e.filter(col("vec_id") % 10 === 5)
      .select((col("vec_id") + NearIdOffset).as("vec_id"),
        concat(
          array(col("embedding")(0) * lit(1.1)),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1)).as("embedding"))
    e.unionAll(dup).unionAll(near)
  }

  val vecsSql: String =
    s"""SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
       UNION ALL
       SELECT vec_id + $ExactIdOffset AS vec_id, embedding::DOUBLE[] AS embedding
       FROM embeddings WHERE vec_id % 10 = 0
       UNION ALL
       SELECT vec_id + $NearIdOffset AS vec_id,
              list_concat([(embedding::DOUBLE[])[1] * 1.1],
                          (embedding::DOUBLE[])[2:]) AS embedding
       FROM embeddings WHERE vec_id % 10 = 5"""
}
