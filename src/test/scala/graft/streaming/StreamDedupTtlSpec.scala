package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

case class DedupDocTs(doc_id: Long, text: String, ts: Timestamp)

/** TTL-bounded state for [[StreamOps.nearDupCandidates]] (the r4
  * verdict's one unbounded-state operator): with `tsCol` set, each LSH
  * bucket carries an event-time timer `ttl` past its latest arrival and
  * is evicted when the watermark passes it — so a continuous ingest
  * holds only the buckets touched within the last `ttl`, and candidates
  * emitted before eviction are unaffected.
  */
class StreamDedupTtlSpec extends SparkSpec {

  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
  private val dupText = "the quick brown fox jumps over the lazy dog again and again"
  private val otherText = "completely different words that share no shingles with anything else here"

  test("bucket state evicts ttl past last arrival; pre-TTL candidates unchanged") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[DedupDocTs]
    val q = StreamOps.nearDupCandidates(input.toDF(), maxBucket = 64,
        tsCol = Some("ts"), ttl = "1 hour", delay = "10 minutes")
      .writeStream.format("memory").queryName("nd_ttl").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ndttl").toString)
      .start()
    def pairs() = spark.table("nd_ttl").select("ai", "bi").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // two near-identical docs inside the TTL window: candidate emitted
      input.addData(DedupDocTs(1L, dupText, t("10:00")),
        DedupDocTs(2L, dupText, t("10:10")))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L)), s"got ${pairs()}")
      // unrelated doc advances the watermark to 11:50 — past the
      // bucket's 10:10 + 1h timer, so its membership state evicts
      input.addData(DedupDocTs(50L, otherText, t("12:00")))
      q.processAllAvailable()
      // a third identical doc AFTER the quiet ttl: bucket restarted
      // fresh, no pair against the evicted members
      input.addData(DedupDocTs(3L, dupText, t("12:05")))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L)),
        s"evicted bucket must not pair with doc 3, got ${pairs()}")
      // but a FOURTH dup inside doc 3's fresh ttl window pairs with it
      // (and only it) — eviction dropped history, not the operator
      input.addData(DedupDocTs(4L, dupText, t("12:20")))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (3L, 4L)), s"got ${pairs()}")
    } finally q.stop()
  }

  test("without eviction (tsCol=None) the same arrivals DO pair across the gap") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[DedupDocTs]
    val q = StreamOps.nearDupCandidates(input.toDF(), maxBucket = 64)
      .writeStream.format("memory").queryName("nd_nottl").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ndnt").toString)
      .start()
    try {
      input.addData(DedupDocTs(1L, dupText, t("10:00")),
        DedupDocTs(2L, dupText, t("10:10")))
      q.processAllAvailable()
      input.addData(DedupDocTs(50L, otherText, t("12:00")))
      q.processAllAvailable()
      input.addData(DedupDocTs(3L, dupText, t("12:05")))
      q.processAllAvailable()
      val got = spark.table("nd_nottl").select("ai", "bi").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)),
        s"NoTimeout form keeps the bucket, got $got")
    } finally q.stop()
  }
}
