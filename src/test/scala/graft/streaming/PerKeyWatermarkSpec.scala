package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

/** Per-key watermark semantics across micro-batches: an event that a
  * GLOBAL watermark would drop (because a fast key advanced the query's
  * watermark) survives when lateness is judged per key, while an event
  * late by its own key's progress is still dropped.
  */
class PerKeyWatermarkSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("event_id", LongType), StructField("value", DoubleType)))

  private def ts(min: Long): Timestamp = new Timestamp(min * 60 * 1000L)

  private lazy val dir: String = {
    val d = Files.createTempDirectory("perkeywm").toString
    // batch 1: fast key A at t=120min, slow key B at t=60min.
    // A global 10-min watermark after batch 1 sits at 110min.
    val b1 = Seq(Row(1L, ts(120), 1L, 1.0), Row(2L, ts(60), 2L, 2.0))
    // batch 2: B at 65min — globally late (65 < 110) but fresh for B
    // (65 >= 60-10); B at 40min — late even for B (40 < 60-10).
    val b2 = Seq(Row(2L, ts(65), 3L, 3.0), Row(2L, ts(40), 4L, 4.0))
    Seq(b1, b2).zipWithIndex.foreach { case (rows, i) =>
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .coalesce(1).write.parquet(s"$d/part$i")
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    d
  }

  test("per-key lateness keeps a slow key's fresh events, drops truly late ones") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src: DataFrame = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/part*")
      val ckpt = Files.createTempDirectory("ckpt-perkeywm").toString
      val q = PerKeyWatermark(src, delayUs = 10L * 60 * 1000000)
        .toDF().writeStream.format("memory").queryName("t_perkey_wm")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val kept = spark.table("t_perkey_wm")
        .collect().map(_.getLong(2)).toSet // event_id
      assert(kept == Set(1L, 2L, 3L),
        s"expected B@65min kept (per-key fresh) and B@40min dropped, got $kept")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("idle keys never stall Spark's watermark — withIdleness is unnecessary by construction") {
    // Flink needs `withIdleness` because its watermark is the MIN
    // across source partitions: one quiet partition stalls event time
    // for the whole job. Spark's watermark is max(observed event time)
    // − delay, a MAX — so an idle key can never hold it back: the
    // active key's progress closes the idle key's open windows.
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp)]
    val agg = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "1 hour"),
        org.apache.spark.sql.functions.col("user_id"))
      .count()
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("count"))
    val ckpt = Files.createTempDirectory("ckpt-idlewm").toString
    val q = agg.writeStream.format("memory").queryName("t_idle_wm")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // both keys live in hour 0; then key 1 goes idle FOREVER
      input.addData((1L, ts(10)), (2L, ts(15)))
      q.processAllAvailable()
      // only key 2 advances — 3 h and then 4 h past the idle key
      input.addData((2L, ts(200)))
      q.processAllAvailable()
      input.addData((2L, ts(260)))
      q.processAllAvailable()
      val emitted = spark.table("t_idle_wm").collect()
        .map(_.getLong(0)).toSet
      assert(emitted.contains(1L),
        "the IDLE key's hour-0 window must close off the active key's progress")
      assert(emitted.contains(2L))
    } finally q.stop()
  }
}
