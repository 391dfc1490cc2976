package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines (chunking —
  * more to grow here as the export surface widens). Kept separate from
  * [[Dedup]]/[[Similarity]]: these transform documents, not identify
  * them. */
object Corpus {

  /** Overlapping token-window chunks: each document's token array is
    * cut into windows of `size` tokens starting every `stride` tokens
    * (stride < size ⇒ overlap of size − stride). Output: (id,
    * chunk_idx, chunk_tokens, chunk array<string>) — one row per
    * window, chunk_idx dense from 0. Empty/whitespace-only documents
    * produce no rows. Purely narrow (stage tokens → explode starts →
    * slice): zero shuffles, the fan-out is ~n/stride per doc and
    * happens after column pruning.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1, s"size/stride must be >= 1, got $size/$stride")
    docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"),
        org.apache.spark.sql.functions.size(col("toks")).as("n"))
      .filter(col("n") > 0)
      // sequence(0, n-1, stride) = every chunk start < n.
      .select(col("id"), col("toks"),
        posexplode(sequence(lit(0), col("n") - 1, lit(stride))))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        slice(col("toks"), col("col") + 1, lit(size)).as("chunk"))
      .select(col("id"), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("chunk")).cast("long")
          .as("chunk_tokens"),
        col("chunk"))
  }
}
