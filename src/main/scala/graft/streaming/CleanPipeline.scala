package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode}

/** A document surviving the incremental dedup stage. */
case class CleanDoc(doc_id: Long, text: String, source: String)

/** A document surviving ingest with its firewall verdict attached. */
case class IngestDoc(doc_id: Long, text: String, source: String,
    contaminated: Boolean)

/** Driver-side running per-source corpus report for
  * [[CleanPipeline.pipelineCleanIncremental]]: additive counters, so
  * merging per-batch partials in any order converges to the batch
  * report (foreachBatch invocations are sequential; reads may be
  * concurrent). */
final class CorpusReportTracker extends Serializable {
  private val acc = scala.collection.concurrent.TrieMap.empty[String, (Long, Long, Long)]

  def merge(rows: Seq[(String, Long, Long, Long)]): Unit =
    rows.foreach { case (src, n, tok, sc) =>
      val (n0, t0, s0) = acc.getOrElse(src, (0L, 0L, 0L))
      acc.update(src, (n0 + n, t0 + tok, s0 + sc))
    }

  /** Current `(source, n_docs, n_tok_total, score_u_total)`, sorted. */
  def current: Seq[(String, Long, Long, Long)] =
    acc.toSeq.map { case (s, (n, t, sc)) => (s, n, t, sc) }.sortBy(_._1)
}

/** Streaming twin of the composed `llm_pipeline_clean` key: the same
  * exact-dedup → quality-filter → per-source-report composition,
  * running INCREMENTALLY so a growing corpus converges to the batch
  * answer without reprocessing (replay equivalence asserted by
  * `CleanPipelineReplaySpec`).
  */
object CleanPipeline {

  /** Stage 1, incremental exact dedup: first-seen document per content
    * hash across all micro-batches. Keyed state in the STATE STORE
    * (one boolean per distinct hash — RocksDB-backed on a real
    * cluster), so the seen-set shuffles once on the hash and never
    * concentrates on the driver. Within a batch the min doc_id wins,
    * so an id-ordered replay reproduces the batch twin's keep-first
    * exactly. Called on a batch frame it degrades to plain keep-min
    * dedup (state starts empty), which is what lets one spec compare
    * both faces.
    *
    * @note scale: state grows with distinct hashes, the same unbounded
    *   retention as Flink keyed dedup without TTL — wire
    *   `GroupStateTimeout.ProcessingTimeTimeout` in the caller when
    *   the corpus has a dedup horizon. */
  def dedupFirstSeenDocs(docs: DataFrame): Dataset[CleanDoc] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id").cast("long"), col("text"), col("source"),
        sha2(col("text"), 256).as("h"))
      .as[(Long, String, String, String)]
      .groupByKey(_._4)
      .flatMapGroupsWithState[Boolean, CleanDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, state) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          val first = it.minBy(_._1)
          Iterator(CleanDoc(first._1, first._2, first._3))
        }
      }
  }

  /** The INGEST face of the full pipeline: both per-document ingest
    * decisions made the moment a document arrives — content-hash
    * keep-first dedup (keyed state, as [[dedupFirstSeenDocs]]) and the
    * contamination-firewall verdict (stateless, against the broadcast
    * benchmark index) — emitting each surviving first-seen document
    * with its verdict attached. The cross-document stages
    * (near-dup clustering, quality floor, sampling, report) run as
    * the downstream confirm step against the doc store the ingest is
    * appending to anyway — exactly the flag→confirm split the
    * streaming dedup family documents. `stream_pipeline_full_replay`
    * gates the whole composition: 5-micro-batch ingest ∪ downstream
    * confirm hash-matches `llm_pipeline_full`'s six-stage oracle.
    *
    * @note scale: one shuffle on the content hash (state = one
    *   boolean per distinct hash); the firewall is a per-row map
    *   against broadcast metadata. Nothing here widens with corpus
    *   size beyond the dedup seen-set. */
  def ingestWithFirewall(docs: DataFrame, evalDocs: DataFrame,
      minShared: Int = 5): Dataset[IngestDoc] = {
    val sp = docs.sparkSession
    import sp.implicits._
    val bc = TextOps.contaminationIndex(sp, evalDocs,
      "doc_id", "text", 3, 50000000L)
    docs.select(col("doc_id").cast("long"), col("text"), col("source"),
        sha2(col("text"), 256).as("h"))
      .as[(Long, String, String, String)]
      .map { case (id, text, src, h) =>
        (id, text, src, h,
          TextOps.worstOverlap(bc.value, text, 3) >= minShared)
      }
      .groupByKey(_._4)
      .flatMapGroupsWithState[Boolean, IngestDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, state) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          val first = it.minBy(_._1)
          Iterator(IngestDoc(first._1, first._2, first._3, first._5))
        }
      }
  }

  /** Stages 2+3 behind a foreachBatch sink: quality-score the deduped
    * batch (stateless, distributed), filter at `minScoreU`, partial-agg
    * per source on the executors, and MERGE the handful of per-source
    * rows into the driver-held tracker. Start the returned writer and
    * read `tracker.current` at any time — after a complete replay it
    * equals the batch `llm_pipeline_clean` report.
    *
    * @note scale: only n_sources rows cross to the driver per batch;
    *   every per-document computation stays on the executors. The
    *   counters are additive because upstream dedup guarantees each
    *   document contributes exactly once. */
  def pipelineCleanIncremental(docs: DataFrame, minScoreU: Long = 500000L)
      : (CorpusReportTracker, DataStreamWriter[Row]) = {
    val tracker = new CorpusReportTracker
    val writer = dedupFirstSeenDocs(docs).toDF().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val part = batch.select("doc_id", "source")
          .join(TextOps.quality(batch).filter(col("score_u") >= minScoreU),
            Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok").cast("long")).as("n_tok_total"),
            sum(col("score_u")).as("score_u_total"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        tracker.merge(part.toSeq)
        ()
      }
    (tracker, writer)
  }
}
