package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded per-group top-k by `(score DESC, id ASC)` — the partial-
  * aggregate replacement for `row_number().over(partitionBy(qid))`
  * ranking in the kNN family (SURVEY.md §2.10 L3).
  *
  * The window form shuffles EVERY scored (query, candidate) pair to
  * rank them, then discards all but k per query — at 100 TB the
  * exchange moves n·q rows to keep q·k. This Aggregator keeps a
  * k-bounded buffer per (partition, query) instead: map-side partial
  * aggregation (ObjectHashAggregate) trims each partition's candidates
  * to k before the exchange, so the shuffle carries at most
  * partitions·q·k entries — independent of corpus size.
  *
  * Truncating a partial buffer to its best k is lossless: an entry
  * outside a partition's local top-k is outside the global top-k under
  * the same total order. The order `(score DESC, id ASC)` is strict
  * (ids are unique per query), so ranks match `row_number` exactly and
  * the DuckDB oracle parity of the `llm_knn_*` keys is unaffected.
  *
  * Input rows are `(id, score)`; the group key (qid) lives outside the
  * aggregator. `finish` emits the final top-k best-first, ready to
  * zip with ranks 1..k.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Long, Double)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // amortize sorting: let the buffer grow to 4k between trims
  private val slack = 4 * k

  private def trim(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (b.lengthCompare(k) <= 0) b
    else b.sortBy { case (s, id) => (-s, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] = {
    val nb = b :+ ((a._2, a._1))
    if (nb.lengthCompare(slack) >= 0) trim(nb) else nb
  }

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(x ++ y)

  override def finish(r: Seq[(Double, Long)]): Seq[(Long, Double)] =
    r.sortBy { case (s, id) => (-s, id) }.take(k)
      .map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
