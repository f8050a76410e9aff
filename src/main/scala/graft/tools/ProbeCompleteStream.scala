package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway timing probe for [[graft.streaming.StreamOps
  * .jaccardCompleteStream]]'s cost components at sf0.1: the one-shot
  * batch face (no replay machinery, no state store) with and without
  * the df snapshot, vs the batch join itself. */
object ProbeCompleteStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = Tables.documents(spark, sfDir)
    time("batch jaccardPairsComplete")(
      graft.operators.DedupOps.jaccardPairsComplete(docs).count())
    time("one-shot stream face, hash order")(
      graft.streaming.StreamOps.jaccardCompleteStream(docs).count())
    val dfStats = graft.operators.DedupOps.hashedShingles(docs)
      .groupBy("h").agg(count(lit(1)).as("gdf"))
    time("dfStats build+collect only")(dfStats.count())
    time("one-shot stream face, rarity order")(
      graft.streaming.StreamOps.jaccardCompleteStream(docs,
        dfStats = Some(dfStats)).count())
    spark.stop()
  }
}
