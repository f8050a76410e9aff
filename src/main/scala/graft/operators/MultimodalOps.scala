package graft.operators

import graft.functions.Hashes
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal record: id + opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, modality: String, n_bytes: Int, payload: Array[Byte])

/** Extracted features for one payload. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, content_hash: Long)

/** Multimodal-column plumbing (SURVEY.md §2.10 L5 + the builder
  * mandate): image/audio/video travel as opaque `binary` columns with
  * typed metadata; decode / feature-extraction runs as a *batched
  * per-partition* function over the binary payloads — the Scala
  * `Dataset.mapPartitions` analogue of a `mapInPandas` pipeline, so the
  * Spark-side schema, partitioning and batch shape are real and tested.
  *
  * The decode step itself is STUBBED deterministically (this container
  * ships no image/audio codecs): `decodeStub` derives features from the
  * raw bytes (length + the cross-engine rolling hash), standing in for
  * a real `jpeg→tensor` decode. Swap `decodeStub` for a codec call and
  * nothing else changes.
  *
  * @note scale: mapPartitions keeps one decoder instance per task and
  *   streams the partition's payloads through it — no per-row UDF setup,
  *   no driver collection. Payload partitions should be sized by bytes
  *   (`spark.sql.files.maxPartitionBytes`), not row count, because rows
  *   are MB-scale; feature output is columnar-small and re-partitions
  *   cheaply for downstream joins.
  */
object MultimodalOps {

  /** Wrap documents into multimodal records: text bytes as the opaque
    * payload (UTF-8 — stands in for image/audio bytes). `n_bytes` is
    * the BYTE length (`octet_length`), not the char count — they differ
    * on non-ASCII text and the features are byte-domain. */
  def toMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id"), lit("text").as("modality"),
        octet_length(encode(col("text"), "utf-8")).as("n_bytes"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MediaRecord]
  }

  /** The stubbed per-payload "decoder": byte length + rolling hash over
    * the raw bytes (identical to [[Hashes.polyHash]] on ASCII text). */
  private[operators] def decodeStub(payload: Array[Byte]): (Int, Long) = {
    var h = 0L
    var i = 0
    while (i < payload.length) {
      h = (h * 31 + (payload(i) & 0xff)) % Hashes.P
      i += 1
    }
    (payload.length, h)
  }

  /** "Resize" stub: deterministic payload downscale to ≤ `maxBytes`
    * (stride-sampled bytes — stands in for an image resize; swap the
    * body for a codec call and the pipeline shape is unchanged).
    * Metadata (`n_bytes`) is recomputed so downstream stages see a
    * consistent record. */
  def resize(media: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    require(maxBytes > 0, s"maxBytes must be positive, got $maxBytes")
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.payload.length <= maxBytes) r
        else {
          // ceil stride so the samples span the WHOLE payload (floor
          // would return a plain prefix when length % maxBytes != 0)
          val stride = (r.payload.length + maxBytes - 1) / maxBytes
          val out = r.payload.indices.by(stride).take(maxBytes)
            .map(r.payload).toArray
          r.copy(n_bytes = out.length, payload = out)
        }
      }
    }
  }

  /** "Frame-sample" stub: split the payload into fixed-size frames and
    * keep every `everyN`-th — the video-frame-sampling batch shape; one
    * output record per kept frame with `(parent id, frame index)`
    * metadata packed into modality. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
      everyN: Int): Dataset[MediaRecord] = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex
          .filter { case (_, i) => i % everyN == 0 }
          .map { case (frame, i) =>
            MediaRecord(r.doc_id, s"${r.modality}/frame=$i", frame.length, frame)
          }
      }
    }
  }

  /** Batched feature extraction over the binary column. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { it =>
      // one "decoder" per task, streaming the partition through it
      it.map { r =>
        val (n, h) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, n, h)
      }
    }
  }
}
