package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

case class TsEvent(ts: Timestamp, v: Double)

/** SURVEY §2.9 T5: rows below the watermark are dropped from windowed
  * aggregations (Spark has no Flink-style late side output — divergence
  * documented in [[StreamOps]]); [[StreamOps.lateCapture]] closes the
  * gap by re-deriving the same watermark and splitting each micro-batch,
  * so the capture side receives exactly the rows the main query drops.
  */
class LateDataSpec extends SparkSpec {

  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("T5 lateCapture receives exactly the rows the main agg drops") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[TsEvent]

    // main windowed aggregation: the query whose drops we shadow
    val agg = input.toDF().withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("string").as("ws"), col("n"))
    val mainQ = agg.writeStream.format("memory").queryName("cap_agg")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-cap-m").toString)
      .start()

    // capture side-channel with the same source + delay
    val captured = scala.collection.mutable.ArrayBuffer.empty[Timestamp]
    var onTimeSeen = 0L
    val capQ = StreamOps.lateCapture(input.toDF(), "ts", "10 minutes") {
      (onTime, late, _) =>
        captured ++= late.select(col("ts")).collect().map(_.getTimestamp(0))
        onTimeSeen += onTime.count()
    }.option("checkpointLocation", Files.createTempDirectory("ckpt-cap-s").toString)
      .start()

    def step(rows: TsEvent*): Unit = {
      input.addData(rows: _*)
      mainQ.processAllAvailable(); capQ.processAllAvailable()
    }
    try {
      step(TsEvent(t("10:00"), 1.0), TsEvent(t("12:30"), 1.0)) // wm after: 12:20
      assert(captured.isEmpty, "nothing is late before a batch completes")
      step(TsEvent(t("10:30"), 1.0)) // below 12:20 -> main drops, capture takes
      step(TsEvent(t("15:00"), 1.0)) // on-time; advances wm
      step(TsEvent(t("18:00"), 1.0)) // flush emissions
      assert(captured.toSeq == Seq(t("10:30")),
        s"capture must hold exactly the dropped row, got $captured")
      assert(onTimeSeen == 4L, s"4 on-time rows expected, got $onTimeSeen")
      val out = spark.table("cap_agg").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out("2024-01-01 10:00:00") == 1L,
        s"main agg must have dropped the late row, got $out")
    } finally { mainQ.stop(); capQ.stop() }
  }

  test("T5 persistDir restores the shadow watermark across a restart") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val dir = Files.createTempDirectory("cap-wm").toString

    // run 1: advance the shadow watermark to 12:20, then stop
    val in1 = MemoryStream[TsEvent]
    val late1 = scala.collection.mutable.ArrayBuffer.empty[Timestamp]
    val q1 = StreamOps.lateCapture(in1.toDF(), "ts", "10 minutes", Some(dir)) {
      (_, late, _) => late1 ++= late.select(col("ts")).collect().map(_.getTimestamp(0))
    }.option("checkpointLocation", Files.createTempDirectory("ckpt-wm1").toString)
      .start()
    in1.addData(TsEvent(t("12:30"), 1.0)); q1.processAllAvailable(); q1.stop()
    assert(late1.isEmpty)

    // run 2, fresh stream + fresh driver state: WITHOUT the persisted
    // horizon this row would be classified on-time (the r4 divergence);
    // with it, the 10:30 row is late immediately on the first batch
    val in2 = MemoryStream[TsEvent]
    val late2 = scala.collection.mutable.ArrayBuffer.empty[Timestamp]
    val q2 = StreamOps.lateCapture(in2.toDF(), "ts", "10 minutes", Some(dir)) {
      (_, late, _) => late2 ++= late.select(col("ts")).collect().map(_.getTimestamp(0))
    }.option("checkpointLocation", Files.createTempDirectory("ckpt-wm2").toString)
      .start()
    in2.addData(TsEvent(t("10:30"), 1.0)); q2.processAllAvailable(); q2.stop()
    assert(late2.toSeq == Seq(t("10:30")),
      s"restored shadow watermark must classify 10:30 late, got $late2")
  }

  test("T5 late row below watermark is excluded from its closed window") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[TsEvent]
    val agg = input.toDF().withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("string").as("ws"), col("n"))
    val ckpt = Files.createTempDirectory("ckpt-late").toString
    val q = agg.writeStream.format("memory").queryName("late_agg")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      input.addData(TsEvent(t("10:00"), 1.0), TsEvent(t("12:30"), 1.0))
      q.processAllAvailable() // watermark after this batch: 12:20
      input.addData(TsEvent(t("10:30"), 1.0)) // LATE: below watermark
      q.processAllAvailable()
      input.addData(TsEvent(t("15:00"), 1.0)) // advance watermark past 13:30
      q.processAllAvailable()
      input.addData(TsEvent(t("18:00"), 1.0)) // one more batch to flush emissions
      q.processAllAvailable()
      val out = spark.table("late_agg").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out("2024-01-01 10:00:00") == 1L,
        s"late 10:30 row must be dropped, got $out")
      assert(out("2024-01-01 12:00:00") == 1L)
    } finally q.stop()
  }
}
