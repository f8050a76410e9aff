package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the multiplexed streaming group quantifier
  * ([[graft.streaming.StreamOps.cepGroupTimesStream]]) against its
  * batch twin at a given sf — the adjudication probe for keeping the
  * streaming form (the r14 join-form replay measured 15–56 s at sf0.1
  * and was dropped; the bar is the replay-harness floor band). */
object GroupStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val grp = Seq("click" -> (col("event_type") === "click"),
      "view" -> (col("event_type") === "view"))
    def time(tag: String)(f: => Long): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[gsp] $tag rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("batch cepGroupTimes") {
      graft.streaming.CepOps.cepGroupTimes(
        graft.Tables.events(spark, sfDir), "user_id", "ts", "event_id",
        grp, n = 2, within = "360 minutes").count()
    }
    val schema = graft.streaming.CepOps.cepGroupTimes(
      graft.Tables.events(spark, sfDir), "user_id", "ts", "event_id",
      grp, n = 2, within = "360 minutes").schema
    time("stream_kleene_replay reference") {
      graft.SparkEntry.queries("stream_kleene_replay")(spark, sfDir)
        .queryExecution.toRdd.count()
    }
    time("stream replay (multiplexed automaton)") {
      graft.streaming.BoundedReplay.replayEvents(spark, sfDir)(ev =>
        graft.streaming.StreamOps.cepGroupTimesStream(ev, "user_id",
          "ts", "event_id", grp, n = 2,
          withinUs = 360L * 60L * 1000000L))(
        _ => spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
        .count()
    }
    spark.stop()
  }
}
