package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** [[WindowProcessors]] — transformWithState ports of windowTopN and
  * cumulateAppend are output-equal to their fMGWS forms under replay
  * (RocksDB provider, the store the StatefulProcessor API targets).
  */
class WindowTwsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocks[T](body: => T): T = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try body
    finally prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
  }

  private def replay(df: DataFrame, name: String): Set[String] = {
    val q = df.writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory(s"ckpt-$name").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).collect().map(_.toSeq.mkString("|")).toSet
  }

  test("windowTopN: transformWithState == flatMapGroupsWithState under replay") {
    withRocks {
      val fmgws = replay(StreamOps.windowTopN(StreamOps.source(spark, sf)).toDF(),
        "wtopn_fmgws")
      val tws = replay(WindowProcessors.windowTopNTws(StreamOps.source(spark, sf)).toDF(),
        "wtopn_tws")
      assert(fmgws.nonEmpty)
      assert(tws == fmgws,
        s"missing=${(fmgws -- tws).size} extra=${(tws -- fmgws).size}")
    }
  }

  test("cumulateAppend: transformWithState == flatMapGroupsWithState under replay") {
    withRocks {
      val fmgws = replay(StreamOps.cumulateAppend(StreamOps.source(spark, sf)).toDF(),
        "cum_fmgws")
      val tws = replay(WindowProcessors.cumulateAppendTws(StreamOps.source(spark, sf)).toDF(),
        "cum_tws")
      assert(fmgws.nonEmpty)
      assert(tws == fmgws,
        s"missing=${(fmgws -- tws).size} extra=${(tws -- fmgws).size}")
    }
  }

  test("overRows TWS: timer-complete up to the final watermark, equals the batch twin there") {
    withRocks {
      import org.apache.spark.sql.functions._
      val tws = replay(WindowProcessors.overRowsTws(StreamOps.source(spark, sf)).toDF(),
        "over_tws")
      // the fMGWS form emits only on keyed input, so it is a subset
      val fmgws = replay(StreamOps.overRows(StreamOps.source(spark, sf)).toDF(),
        "over_fmgws")
      assert(fmgws.subsetOf(tws))
      // timers close the gap: everything at or below the final
      // watermark (max ts − 30 min) must be emitted, and match the
      // batch window-function twin exactly
      val ev = graft.Tables.events(spark, sf)
      val wmUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) -
        30L * 60L * 1000000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
      val batch = ev
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          count(lit(1)).over(w).cast("int").as("n_frame"),
          sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
            .as("over_sum"))
        .filter(col("ts_us") <= wmUs)
        .select("user_id", "event_id", "n_frame", "over_sum")
        .collect().map(_.toSeq.mkString("|")).toSet
      assert(batch.nonEmpty)
      assert(tws == batch,
        s"missing=${(batch -- tws).size} extra=${(tws -- batch).size}")
    }
  }

  test("cumulateAppend TWS: multi-batch window loses nothing (the r4 regression shape)") {
    withRocks {
      val sp = spark
      import sp.implicits._
      implicit val ctx = sp.sqlContext
      def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
      def us(hhmm: String) = t(hhmm).getTime * 1000L
      val input = MemoryStream[CumEvent]
      val q = WindowProcessors.cumulateAppendTws(input.toDF()).writeStream
        .format("memory").queryName("cum_tws_mb").outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("ckpt-ctm").toString)
        .start()
      try {
        input.addData(CumEvent(t("08:30"), 1.0)); q.processAllAvailable()
        input.addData(CumEvent(t("09:30"), 2.0)); q.processAllAvailable()
        input.addData(CumEvent(t("10:45"), 4.0)); q.processAllAvailable()
        input.addData(CumEvent(t("11:30"), 8.0)); q.processAllAvailable()
        input.addData(CumEvent(t("13:00"), 0.0)); q.processAllAvailable()
        val real = spark.table("cum_tws_mb").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .filter(_._1 == us("08:00")).toSet
        assert(real == Set(
          (us("08:00"), us("09:00"), 1L, 1.0),
          (us("08:00"), us("10:00"), 2L, 3.0),
          (us("08:00"), us("11:00"), 3L, 7.0),
          (us("08:00"), us("12:00"), 4L, 15.0)), s"got $real")
      } finally q.stop()
    }
  }
}
