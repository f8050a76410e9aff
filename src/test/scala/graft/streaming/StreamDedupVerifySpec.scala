package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[StreamOps.nearDupVerified]] — the in-stream flag→confirm loop:
  * candidates from the stateful LSH stage, exact-Jaccard-verified per
  * micro-batch against the corpus-so-far (an appended parquet doc
  * store, re-read each batch). A complete replay must reproduce the
  * batch [[DedupOps.minhashNearDups]] pair set exactly, jac values
  * included.
  */
class StreamDedupVerifySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("replayed verified pairs equal batch minhashNearDups (values included)") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val docsDf = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val batchTruth = DedupOps.minhashNearDups(docsDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchTruth.nonEmpty, "fixture must contain verified near-dups")

    // the doc store the ingest would maintain: appended BEFORE each
    // chunk enters the stream, so the verify's corpus-so-far always
    // covers every doc a candidate pair can reference
    val store = Files.createTempDirectory("docstore").toString
    val verified = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val input = MemoryStream[DedupDoc]
    val q = StreamOps.nearDupVerified(input.toDF(),
        corpus = s => s.read.parquet(store), maxBucket = 4096) {
        (batch, _) =>
          verified ++= batch.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ndv").toString)
      .start()
    try {
      val all = docsDf.as[DedupDoc].collect().sortBy(_.doc_id)
      all.grouped(120).foreach { chunk =>
        chunk.toSeq.toDF().write.mode("append").parquet(store)
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(verified.toSet == batchTruth,
      s"missing=${(batchTruth -- verified).size} extra=${(verified.toSet -- batchTruth).size}")
  }
}
