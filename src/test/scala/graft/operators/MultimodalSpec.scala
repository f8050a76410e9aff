package graft.operators

import graft.{SparkSpec, Tables}

/** The multimodal pipeline stages beyond the oracle-checked features
  * key: resize and frame-sampling stubs — asserting the Spark-side
  * plumbing (schema, record shape, determinism) that a real codec would
  * slot into.
  */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("resize bounds every payload and keeps ids/schema") {
    val media = MultimodalOps.toMedia(Tables.documents(spark, sf))
    val resized = MultimodalOps.resize(media, maxBytes = 64).collect()
    assert(resized.length == media.count())
    assert(resized.forall(r => r.payload.length <= 64 && r.n_bytes == r.payload.length))
    // deterministic: same input -> same bytes
    val again = MultimodalOps.resize(MultimodalOps.toMedia(
      Tables.documents(spark, sf)), maxBytes = 64).collect()
    assert(resized.map(_.payload.toSeq).toSeq.sorted(Ordering.by((x: Seq[Byte]) => x.mkString(","))) ==
      again.map(_.payload.toSeq).toSeq.sorted(Ordering.by((x: Seq[Byte]) => x.mkString(","))))
  }

  test("frame sampling keeps every Nth fixed-size frame with indexed metadata") {
    val media = MultimodalOps.toMedia(Tables.documents(spark, sf))
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 32, everyN = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.payload.length <= 32))
    assert(frames.forall(_.modality.matches("text/frame=\\d+")))
    // only even frame indices survive everyN = 2
    assert(frames.forall(_.modality.split("=")(1).toInt % 2 == 0))
    // per-doc frame count = ceil(ceil(n_bytes/32) / 2)
    val perDoc = frames.groupBy(_.doc_id).view.mapValues(_.length).toMap
    val expected = media.collect().map { r =>
      val nFrames = (r.n_bytes + 31) / 32
      r.doc_id -> (nFrames + 1) / 2
    }.toMap
    assert(perDoc == expected)
  }
}
