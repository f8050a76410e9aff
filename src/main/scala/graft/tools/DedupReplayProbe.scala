package graft.tools

import graft.Tables
import graft.operators.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for the streaming-dedup replay keys (VERDICT r15
  * item 6): separates each key into its pipeline stages — df snapshot,
  * the REAL streaming replay (staging + 5 micro-batches of keyed
  * state), and the downstream exact verify — so "replay-scaffold floor
  * vs state cost vs verify cost" is measured, not guessed.
  * Usage: runMain graft.tools.DedupReplayProbe [sfDir] [reps]
  */
object DedupReplayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def steal(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().find(_.startsWith("cpu "))
          .map(_.trim.split("\\s+")(8).toLong).getOrElse(0L)
        finally src.close()
      } catch { case _: Throwable => 0L }
    def t[A](label: String)(f: => A): A = {
      val s0 = steal(); val t0 = System.nanoTime()
      val r = f
      println(f"[dedupreplay] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s (steal ${steal() - s0})")
      r
    }
    // warm
    graft.SparkEntry.queries("agg_pricing_summary")(spark, sfDir)
      .queryExecution.toRdd.count()

    (1 to reps).foreach { rep =>
      println(s"[dedupreplay] === rep $rep ===")
      // --- stream_dedup_capped_replay, staged ---
      val dfStats = t("capped: dfStats agg") {
        val d = DedupOps.hashedShingles(Tables.documents(spark, sfDir))
          .groupBy("h").agg(count(lit(1)).as("gdf"))
        d.queryExecution.toRdd.count(); d
      }
      val cands = t("capped: streaming replay") {
        val c = graft.streaming.BoundedReplay.replayDocuments(spark, sfDir,
            sinkPartitions = 8)(docs =>
          graft.streaming.StreamOps.jaccardCappedStream(docs, dfStats,
            maxShingleDf = 1000L, tsCol = Some("ts"), ttl = "365 days").toDF())
          .distinct()
        println(s"[dedupreplay]   flagged pairs: ${c.count()}")
        c
      }
      t("capped: exact verify") {
        DedupOps.jaccardForHashed(cands,
            DedupOps.hashedShingles(Tables.documents(spark, sfDir)))
          .filter(col("jac") >= 0.5)
          .orderBy("ai", "bi").queryExecution.toRdd.count()
      }
      // --- stream_dedup_complete_replay (in-state verify, no confirm) ---
      t("complete: dfStats + replay (all)") {
        val dfS = DedupOps.hashedShingles(Tables.documents(spark, sfDir))
          .groupBy("h").agg(count(lit(1)).as("gdf"))
        graft.streaming.BoundedReplay.replayDocuments(spark, sfDir)(docs =>
          graft.streaming.StreamOps.jaccardCompleteStream(docs, tNum = 4,
            tDen = 5, tsCol = Some("ts"), ttl = "365 days",
            dfStats = Some(dfS)).toDF())
          .orderBy("ai", "bi").queryExecution.toRdd.count()
      }
      // --- stream_containment_complete_replay ---
      val ccands = t("containment: streaming replay") {
        val c = graft.streaming.BoundedReplay.replayDocuments(spark, sfDir)(docs =>
          graft.streaming.StreamOps.containmentCandidatesStream(docs,
            tNum = 4, tDen = 5, tsCol = Some("ts"), ttl = "365 days").toDF())
          .distinct()
        println(s"[dedupreplay]   flagged pairs: ${c.count()}")
        c
      }
      t("containment: exact verify") {
        DedupOps.containmentForHashed(ccands,
            DedupOps.hashedShingles(Tables.documents(spark, sfDir)))
          .filter(greatest(col("cont_a"), col("cont_b")) >= lit(4.0 / 5))
          .orderBy("ai", "bi").queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
