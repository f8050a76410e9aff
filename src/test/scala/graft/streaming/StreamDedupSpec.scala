package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.SketchAggregators
import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

case class DedupDoc(doc_id: Long, text: String)

/** [[StreamOps.nearDupCandidates]] — streaming MinHash-LSH:
  *  - after a complete replay, the distinct candidate set equals the
  *    batch operator's band self-join (proves the per-row HOF signature
  *    is bit-identical to the udaf-built one);
  *  - the one-shot batch-face call of the same function agrees;
  *  - every batch-VERIFIED near-dup pair appears among the candidates.
  */
class StreamDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docsDf: DataFrame =
    Tables.documents(spark, sf).select(col("doc_id"), col("text"))

  /** The batch candidate stage exactly as minhashNearDups builds it. */
  private def batchCandidates: Set[(Long, Long)] = {
    val M = 2147483647L
    val minhashSig = udaf(SketchAggregators.MinHashSig, Encoders.scalaLong)
    val sig = DedupOps.hashedShingles(docsDf)
      .withColumn("x", col("h") % M)
      .groupBy("doc_id").agg(minhashSig(col("x")).as("sig"))
    val bands = sig
      .select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("band"), col("sig"))
      .withColumn("bsig", expr(
        "concat_ws(',', transform(slice(sig, band*4 + 1, 4), v -> CAST(v AS STRING)))"))
      .select("doc_id", "band", "bsig")
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("replayed candidates equal the batch band join; verified pairs covered") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val expected = batchCandidates
    assert(expected.nonEmpty, "fixture must contain band collisions")

    val all = docsDf.as[DedupDoc].collect().sortBy(_.doc_id)
    val input = MemoryStream[DedupDoc]
    val out = StreamOps.nearDupCandidates(input.toDF(), maxBucket = 4096)
    val q = out.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-nd").toString)
      .start()
    val streamed = try {
      all.grouped(120).foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }
      spark.table("neardup_stream").select("ai", "bi").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
    assert(streamed == expected,
      s"missing=${(expected -- streamed).size} extra=${(streamed -- expected).size}")

    // one-shot batch face of the SAME function
    val oneShot = StreamOps.nearDupCandidates(docsDf, maxBucket = 4096)
      .select("ai", "bi").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oneShot == expected)

    // the real batch operator's verified near-dups are all candidates
    val verified = DedupOps.minhashNearDups(docsDf)
      .select("ai", "bi").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(expected))
    assert(verified.subsetOf(streamed))
  }
}
