package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

case class TsEvent(ts: Timestamp, v: Double)

/** SURVEY §2.9 T5: rows below the watermark are dropped from windowed
  * aggregations (Spark has no Flink-style late side output — divergence
  * documented in [[StreamOps]]).
  */
class LateDataSpec extends SparkSpec {

  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

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
