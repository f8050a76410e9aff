package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-to-training-sequences stage: context-window chunking of long
  * documents and token-budget packing of short ones — the two halves of
  * turning a cleaned corpus into fixed-length training rows.
  */
object PackOps {

  /** Split each doc's whitespace tokens into overlapping windows of
    * `size` tokens advancing by `size - overlap` (the final window may
    * be short; a doc shorter than `size` yields one chunk). Emits
    * `(doc_id, chunk_id, n_tok, chunk_text)`.
    *
    * @note scale: pure per-row explode — no shuffle; output row count
    *   is corpus tokens / stride. The token array lives once per input
    *   row, so executor memory is bounded by the longest document, not
    *   the corpus. */
  def chunk(df: DataFrame, size: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size)
    val stride = size - overlap
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .withColumn("nc",
        when(org.apache.spark.sql.functions.size(col("t")) <= size, lit(1))
          .otherwise(expr(
            s"(size(t) - $size + ${stride - 1}) div $stride + 1")))
      .select(col("doc_id"), explode(expr("sequence(0, nc - 1)")).as("ci"),
        col("t"))
      .withColumn("chunk_id", col("ci").cast("int")).drop("ci")
      .withColumn("ch", expr(s"slice(t, chunk_id * $stride + 1, $size)"))
      .select(col("doc_id"), col("chunk_id"),
        org.apache.spark.sql.functions.size(col("ch")).as("n_tok"),
        array_join(col("ch"), " ").as("chunk_text"))
  }

  /** Assign docs to fixed token-budget bins by cumulative token count
    * in `idCol` order within each stratum: bin = (tokens before this
    * doc) div budget — the deterministic approximation of greedy
    * sequence packing (a doc may straddle a boundary; the trainer's
    * concat-then-split handles that). Emits
    * `(stratum, doc_id, n_tok, cum_before, bin)`.
    *
    * @note scale: packing is inherently sequential in doc order, so
    *   parallelism comes from the stratum column (pack per source /
    *   shard); each stratum is one window partition — pick strata so a
    *   single stratum's docs fit one task's spill budget, the same
    *   rule as any skewed window. */
  def packBins(df: DataFrame, budget: Long, strataCol: String = "source",
      idCol: String = "doc_id", tokCol: String = "n_tok"): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(strataCol), col(idCol), col(tokCol).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $budget"))
  }
}
