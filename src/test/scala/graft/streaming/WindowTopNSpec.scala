package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** [[StreamOps.windowTopN]] — Flink Window Top-N parity:
  *  - a window's top-k is emitted ONLY after the watermark passes its
  *    end (event-time timer), never incrementally per batch;
  *  - the emission is one-shot and final (append semantics, no retract);
  *  - the emitted set equals the batch agg+rank twin that carries the
  *    `stream_window_topn` oracle key.
  */
class WindowTopNSpec extends SparkSpec {

  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
  private val H = 3600L * 1000000L
  private val W10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L

  test("top-k emits once at window close, gated by the watermark") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[CepEvent]
    val out = StreamOps.windowTopN(input.toDF(), k = 2)
    val q = out.writeStream.format("memory").queryName("wtopn")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-wtopn").toString)
      .start()
    try {
      // hour 10: user 1 ×3, user 2 ×2, user 3 ×1 → top-2 = (1,3),(2,2)
      input.addData(
        CepEvent(1L, t("10:00"), 1L, "click"), CepEvent(1L, t("10:10"), 2L, "click"),
        CepEvent(2L, t("10:15"), 3L, "view"), CepEvent(3L, t("10:20"), 4L, "view"))
      q.processAllAvailable()
      assert(spark.table("wtopn").count() == 0,
        "nothing may emit while the window is open")
      input.addData(
        CepEvent(1L, t("10:40"), 5L, "click"), CepEvent(2L, t("10:50"), 6L, "view"))
      q.processAllAvailable()
      assert(spark.table("wtopn").count() == 0,
        "still inside the window + delay horizon")
      // sentinel beyond 11:00 + 10 min delay closes hour 10
      input.addData(CepEvent(99L, t("11:30"), 99L, "view"))
      q.processAllAvailable()
      val got = spark.table("wtopn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      assert(got == Set((W10, 1L, 3L, 1), (W10, 2L, 2L, 2)), s"got $got")
    } finally q.stop()
  }

  test("replayed emissions + end-of-replay state flush equal the batch twin (no sentinel)") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[CepEvent].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[CepEvent]
    val out = StreamOps.windowTopN(input.toDF(), k = 3)
    val ckpt = Files.createTempDirectory("ckpt-wtopnr").toString
    val q = out.writeStream.format("memory").queryName("wtopn_replay")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val streamed = try {
      ev.grouped(400).foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }
      rows(spark.table("wtopn_replay"))
    } finally q.stop()
    // windows still open at end of replay (timers beyond the final
    // watermark) are drained straight from the checkpointed state
    val flushed = rows(StateFlush.windowTopN(spark, ckpt, k = 3).toDF())
    assert(flushed.nonEmpty, "the replay tail must exist for this test to bite")
    assert(streamed.intersect(flushed).isEmpty,
      "fired windows drop their state — streamed and flush never overlap")
    val batch = rows(SparkEntry.queries("stream_window_topn")(spark, sf))
    val got = streamed ++ flushed
    assert(got == batch,
      s"missing=${(batch -- got).size} extra=${(got -- batch).size}")
    assert(streamed.nonEmpty)
  }
}
