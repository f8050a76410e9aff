package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** HDFS-backed vs RocksDB state store on the state-heaviest replay
  * shapes — the dedup index builders, whose keyed state GROWS every
  * micro-batch (the HDFS-backed provider re-snapshots each partition's
  * FULL map per checkpoint; RocksDB with changelog checkpointing
  * writes only the batch's changed entries). Times both providers on
  * the same op and asserts the outputs are identical — the store is an
  * execution detail, never a semantics knob.
  *
  * Usage: runMain graft.tools.StateStoreProbe <sfDir> [reps]
  */
object StateStoreProbe {
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
    graft.SparkEntry.queries("agg_pricing_summary")(spark, sfDir)
      .queryExecution.toRdd.count()

    def cappedFlags(store: String): (Double, Long) = {
      val dfStats = graft.operators.DedupOps
        .hashedShingles(Tables.documents(spark, sfDir))
        .groupBy("h").agg(count(lit(1)).as("gdf"))
      val t0 = System.nanoTime()
      val n = graft.streaming.BoundedReplay.replayDocuments(spark, sfDir,
          sinkPartitions = 8, stateStore = store)(docs =>
        graft.streaming.StreamOps.jaccardCappedStream(docs, dfStats,
          maxShingleDf = 1000L, tsCol = Some("ts"), ttl = "365 days").toDF())
        .distinct().count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    def completePairs(store: String): (Double, Long) = {
      val dfStats = graft.operators.DedupOps
        .hashedShingles(Tables.documents(spark, sfDir))
        .groupBy("h").agg(count(lit(1)).as("gdf"))
      val t0 = System.nanoTime()
      val n = graft.streaming.BoundedReplay.replayDocuments(spark, sfDir,
          stateStore = store)(docs =>
        graft.streaming.StreamOps.jaccardCompleteStream(docs,
          tNum = 4, tDen = 5, tsCol = Some("ts"), ttl = "365 days",
          dfStats = Some(dfStats)).toDF())
        .distinct().count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    (1 to reps).foreach { rep =>
      println(s"[stateprobe] === rep $rep ===")
      for ((label, f) <- Seq(
          "capped-flags  " -> (cappedFlags _),
          "complete-pairs" -> (completePairs _))) {
        val (th, nh) = f("hdfs")
        val (tr, nr) = f("rocksdb")
        require(nh == nr, s"$label: provider changed the result! $nh vs $nr")
        println(f"[stateprobe] $label hdfs ${th}%6.2f s | rocksdb ${tr}%6.2f s" +
          f" | ratio ${tr / th}%.2f (rows $nh)")
      }
    }
    spark.stop()
  }
}
