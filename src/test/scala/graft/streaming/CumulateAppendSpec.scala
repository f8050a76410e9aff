package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

case class CumEvent(ts: Timestamp, value: Double)

/** [[StreamOps.cumulateAppend]] — append-mode CUMULATE with the
  * watermark on the REAL event-time column (the r4 ADVICE regression:
  * the old form watermarked the exploded window-end column, so the
  * first event of a window advanced the watermark to `ws + size -
  * delay` and every later micro-batch's events silently vanished from
  * all earlier cumulative sub-windows).
  */
class CumulateAppendSpec extends SparkSpec {

  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
  private def us(hhmm: String) = t(hhmm).getTime * 1000L

  test("a CUMULATE window spanning several micro-batches loses nothing (append mode)") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[CumEvent]
    val q = StreamOps.cumulateAppend(input.toDF()).writeStream
      .format("memory").queryName("cum_mb").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-cum").toString)
      .start()
    def got() = spark.table("cum_mb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    try {
      // window [08:00, 12:00), one event per micro-batch
      input.addData(CumEvent(t("08:30"), 1.0)); q.processAllAvailable()
      assert(got().isEmpty, "watermark 08:20 has passed no sub-window end " +
        "(the old we_ts watermark would already sit at 11:50 here)")
      input.addData(CumEvent(t("09:30"), 2.0)); q.processAllAvailable()
      assert(got() == Set((us("08:00"), us("09:00"), 1L, 1.0)),
        "end 09:00 closes with ONLY the first event")
      input.addData(CumEvent(t("10:45"), 4.0)); q.processAllAvailable()
      input.addData(CumEvent(t("11:30"), 8.0)); q.processAllAvailable()
      // sentinel past 12:00 + delay closes the whole window
      input.addData(CumEvent(t("13:00"), 0.0)); q.processAllAvailable()
      val real = got().filter(_._1 == us("08:00"))
      // each later-batch event lands in every later cumulative end —
      // exactly what the old watermark placement dropped
      assert(real == Set(
        (us("08:00"), us("09:00"), 1L, 1.0),
        (us("08:00"), us("10:00"), 2L, 3.0),
        (us("08:00"), us("11:00"), 3L, 7.0),
        (us("08:00"), us("12:00"), 4L, 15.0)), s"got $real")
    } finally q.stop()
  }

  test("ends whose own step bucket is empty still emit (cumulative grid is dense)") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[CumEvent]
    val q = StreamOps.cumulateAppend(input.toDF()).writeStream
      .format("memory").queryName("cum_gap").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-cumg").toString)
      .start()
    try {
      // data only in hour 08; hours 09-11 empty; totals must repeat
      input.addData(CumEvent(t("08:10"), 2.5), CumEvent(t("08:40"), 1.5))
      q.processAllAvailable()
      input.addData(CumEvent(t("13:00"), 0.0)); q.processAllAvailable()
      val real = spark.table("cum_gap").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .filter(_._1 == us("08:00")).toSet
      assert(real == Set(
        (us("08:00"), us("09:00"), 2L, 4.0),
        (us("08:00"), us("10:00"), 2L, 4.0),
        (us("08:00"), us("11:00"), 2L, 4.0),
        (us("08:00"), us("12:00"), 2L, 4.0)), s"got $real")
    } finally q.stop()
  }

  test("chunked replay + end-of-replay state flush equals the batch twin (no sentinel)") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf).select(col("ts"), col("value"))
      .as[CumEvent].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[CumEvent]
    val ckpt = Files.createTempDirectory("ckpt-cumr").toString
    val q = StreamOps.cumulateAppend(input.toDF()).writeStream
      .format("memory").queryName("cum_replay").outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    val streamed = try {
      ev.grouped(400).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      spark.table("cum_replay").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    } finally q.stop()
    // ends beyond the final watermark drain from the checkpointed state
    val flushed = StateFlush.cumulateAppend(spark, ckpt).collect()
      .map(r => (r.ws_us, r.we_us, r.n, r.sum_value)).toSet
    assert(flushed.nonEmpty, "the replay tail must exist for this test to bite")
    assert(streamed.intersect(flushed).isEmpty,
      "emitted ends advance emittedUpTo — streamed and flush never overlap")
    val batch = SparkEntry.queries("stream_cumulate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val got = streamed ++ flushed
    assert(got == batch,
      s"missing=${(batch -- got).size} extra=${(got -- batch).size}")
    assert(streamed.nonEmpty)
  }
}
