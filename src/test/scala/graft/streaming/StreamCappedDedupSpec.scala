package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[StreamOps.jaccardCappedStream]] — the permissive-threshold
  * (df-cap contract) streaming twin of [[DedupOps.jaccardPairs]]:
  *  - the one-shot face flags EXACTLY the batch capped candidate set,
  *    and flag→confirm equals the batch key's thresholded output;
  *  - a chunked MemoryStream replay flags the same set;
  *  - hot shingles are excluded on BOTH faces consistently (a pair
  *    sharing only hot shingles is missed by both — the documented
  *    boilerplate trade);
  *  - the TTL horizon is deterministic in the two event times;
  *  - the hot-snapshot cap fails loudly.
  */
class StreamCappedDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docsDf: DataFrame =
    Tables.documents(spark, sf).select(col("doc_id"), col("text"))

  private def dfStats(df: DataFrame): DataFrame =
    DedupOps.hashedShingles(df).groupBy("h").agg(count(lit(1)).as("gdf"))

  test("one-shot face: flagged set == batch capped candidates; flag→confirm == batch key") {
    val batchCands = DedupOps.jaccardPairs(docsDf, maxShingleDf = 1000L)
      .select(col("ai"), col("bi"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchCands.nonEmpty, "fixture must produce candidates")
    val flagged = StreamOps.jaccardCappedStream(docsDf, dfStats(docsDf),
        maxShingleDf = 1000L).toDF().distinct()
    val flaggedSet = flagged.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flaggedSet == batchCands,
      s"missing=${(batchCands -- flaggedSet).size} extra=${(flaggedSet -- batchCands).size}")
    val confirmed = DedupOps.jaccardForHashed(flagged,
        DedupOps.hashedShingles(docsDf))
      .filter(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batchKey = DedupOps.jaccardPairs(docsDf, maxShingleDf = 1000L)
      .filter(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(confirmed == batchKey, "flag→confirm must equal the batch capped key")
  }

  test("chunked replay flags the same set as the one-shot face") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val oneShot = StreamOps.jaccardCappedStream(docsDf, dfStats(docsDf),
        maxShingleDf = 1000L).toDF().distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = docsDf.as[DedupDoc].collect().sortBy(_.doc_id)
    val input = MemoryStream[DedupDoc]
    val out = StreamOps.jaccardCappedStream(input.toDF(), dfStats(docsDf),
      maxShingleDf = 1000L)
    val q = out.writeStream.format("memory").queryName("capped_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-cap").toString)
      .start()
    val got = try {
      all.grouped(12).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      spark.table("capped_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
    assert(got == oneShot, "replay must flag exactly the one-shot set")
  }

  test("hot-shingle exclusion matches the batch contract at a tight cap") {
    val sp = spark
    import sp.implicits._
    // doc 0/1 share ONLY the boilerplate trailer (df=3 > cap=2);
    // doc 2/3 share a rare run — only (2,3) may flag
    val trailer = "subscribe to our newsletter for more"
    val docs = Seq(
      (0L, "alpha beta gamma " + trailer),
      (1L, "delta epsilon zeta " + trailer),
      (2L, "eta theta iota kappa lambda mu " + trailer),
      (3L, "eta theta iota kappa lambda nu " + trailer))
      .toDF("doc_id", "text")
    val st = dfStats(docs)
    val flagged = StreamOps.jaccardCappedStream(docs, st, maxShingleDf = 2L)
      .toDF().distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = DedupOps.jaccardPairs(docs, maxShingleDf = 2L)
      .select(col("ai"), col("bi"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == batch, s"stream $flagged vs batch $batch")
    assert(!flagged.exists(p => p == ((0L, 1L))),
      "a pair sharing only hot shingles must be missed (documented trade)")
    assert(flagged.contains((2L, 3L)))
  }

  test("ttl horizon: cross-horizon pairs drop, in-horizon pairs survive") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      TsDoc(0L, base, ts(0)), TsDoc(1L, base + " iota", ts(600)),
      TsDoc(2L, base + " kappa", ts(3600 * 3 + 600)))
    val stats = dfStats(Seq(
      (0L, base), (1L, base + " iota"), (2L, base + " kappa"))
      .toDF("doc_id", "text"))
    val input = MemoryStream[TsDoc]
    val out = StreamOps.jaccardCappedStream(input.toDF(), stats,
      maxShingleDf = 1000L, tsCol = Some("ts"), ttl = "1 hour")
    val q = out.writeStream.format("memory").queryName("capped_ttl")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-capttl").toString)
      .start()
    val got = try {
      docs.foreach { d => input.addData(d); q.processAllAvailable() }
      spark.table("capped_ttl")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
    assert(got == Set((0L, 1L)),
      s"only the in-horizon pair may flag, got $got")
  }

  test("the hot-snapshot cap fails loudly") {
    val e = intercept[IllegalArgumentException] {
      StreamOps.jaccardCappedStream(docsDf, dfStats(docsDf),
        maxShingleDf = 1L, maxHotSnapshot = 3L)
    }
    assert(e.getMessage.contains("raise maxShingleDf"),
      s"the guard must name the lever, got: ${e.getMessage}")
  }
}
