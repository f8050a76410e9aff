package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

case class TsDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

/** [[StreamOps.jaccardCompleteStream]] — the streaming twin of the
  * certified-complete batch join:
  *  - a chunked MemoryStream replay emits EXACTLY the batch
  *    [[DedupOps.jaccardPairsComplete]] pair set (ids AND jac values),
  *    in hash order and in df-snapshot rarity order;
  *  - the one-shot batch face of the same function agrees;
  *  - the TTL horizon is deterministic: pairs whose documents arrive
  *    further apart than `ttl` are not flagged, all others are;
  *  - the df-snapshot cap fails loudly.
  */
class StreamCompleteDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docsDf: DataFrame =
    Tables.documents(spark, sf).select(col("doc_id"), col("text"))

  private def batchPairs: Set[(Long, Long, Double)] =
    DedupOps.jaccardPairsComplete(docsDf, tNum = 4, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def runStream(dfStats: Option[DataFrame]): Set[(Long, Long, Double)] = {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val all = docsDf.as[DedupDoc].collect().sortBy(_.doc_id)
    val input = MemoryStream[DedupDoc]
    val out = StreamOps.jaccardCompleteStream(input.toDF(), tNum = 4, tDen = 5,
      dfStats = dfStats)
    val q = out.writeStream.format("memory").queryName("complete_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-cd").toString)
      .start()
    try {
      all.grouped(12).foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }
      spark.table("complete_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally q.stop()
  }

  test("chunked replay equals the batch complete join — hash order and rarity order") {
    val expected = batchPairs
    assert(expected.nonEmpty, "fixture must contain jac >= 0.8 pairs")
    val hashOrder = runStream(None)
    assert(hashOrder == expected,
      s"hash-order missing=${(expected -- hashOrder).size} extra=${(hashOrder -- expected).size}")
    val dfStats = DedupOps.hashedShingles(docsDf)
      .groupBy("h").agg(count(lit(1)).as("gdf"))
    val rarityOrder = runStream(Some(dfStats))
    assert(rarityOrder == expected, "order choice must never change the pair set")
  }

  test("one-shot batch face equals the batch operator, and each pair emits once") {
    val sp = spark
    import sp.implicits._
    val rows = StreamOps.jaccardCompleteStream(docsDf, tNum = 4, tDen = 5)
      .collect()
    assert(rows.map(p => (p.ai, p.bi, p.jac)).toSet == batchPairs)
    assert(rows.length == rows.map(p => (p.ai, p.bi)).distinct.length,
      "the canonical-first-shared-hash rule must dedupe emission")
  }

  test("ttl horizon: cross-horizon pairs drop, in-horizon pairs survive") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    // three near-identical docs: (0,1) within one hour, 2 arrives 3h
    // after both — with ttl=1h the (·,2) pairs must NOT flag
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      TsDoc(0L, base, ts(0)), TsDoc(1L, base + " iota", ts(600)),
      TsDoc(2L, base + " kappa", ts(3600 * 3 + 600)))
    val input = MemoryStream[TsDoc]
    val out = StreamOps.jaccardCompleteStream(input.toDF(), tNum = 1, tDen = 2,
      tsCol = Some("ts"), ttl = "1 hour")
    val q = out.writeStream.format("memory").queryName("ttl_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ttl").toString)
      .start()
    val got = try {
      docs.foreach { d => input.addData(d); q.processAllAvailable() }
      spark.table("ttl_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
    assert(got == Set((0L, 1L)),
      s"only the in-horizon pair may flag, got $got")
  }

  test("containment candidates cover the batch complete join; verify confirms exactly") {
    val sp = spark
    import sp.implicits._
    val batch = DedupOps.containmentPairsComplete(docsDf, tNum = 4, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must contain containment pairs")
    // one-shot batch face of the candidates stream
    val cands = StreamOps.containmentCandidatesStream(docsDf, tNum = 4, tDen = 5)
      .toDF().distinct()
    val candSet = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.subsetOf(candSet),
      s"flagged set must cover every qualifying pair; missing=${batch -- candSet}")
    val verified = DedupOps.containmentForHashed(cands,
        DedupOps.hashedShingles(docsDf))
      .filter(greatest(col("cont_a"), col("cont_b")) >= lit(4.0 / 5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == batch, "flag -> confirm must equal the batch complete join")
  }

  test("the df-snapshot cap fails loudly") {
    val dfStats = DedupOps.hashedShingles(docsDf)
      .groupBy("h").agg(count(lit(1)).as("gdf"))
    val e = intercept[IllegalArgumentException] {
      StreamOps.jaccardCompleteStream(docsDf, dfStats = Some(dfStats),
        maxDfSnapshot = 3L)
    }
    assert(e.getMessage.contains("hot tail"),
      s"the guard must name the capped-snapshot route, got: ${e.getMessage}")
  }
}
