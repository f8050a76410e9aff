package graft.tools

import graft.Tables
import graft.functions.Hashes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B timing probe: the r3 inline-count jaccardPairs shape vs the r4
  * capped candidates + full-set verify shape, same JVM, alternating
  * reps so host noise hits both arms equally.
  * Usage: `sbt "runMain graft.tools.DedupAB [sfDir]"`. */
object DedupAB {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sf)

    def oldShape(): DataFrame = {
      val sh = graft.operators.DedupOps.hashedShingles(docs).persist()
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a").hint("shuffle_hash")
        .join(sh.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("ai"), col("b.doc_id").as("bi"))
        .agg(count(lit(1)).as("c"))
      inter
        .join(sz.as("sa"), col("ai") === col("sa.doc_id"))
        .join(sz.as("sb"), col("bi") === col("sb.doc_id"))
        .select(col("ai"), col("bi"),
          round(col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c")), 6).as("jac"))
        .filter(col("jac") >= 0.5)
    }
    def newShape(): DataFrame =
      graft.operators.DedupOps.jaccardPairs(docs).filter(col("jac") >= 0.5)

    for (rep <- 1 to 3; (name, f) <- Seq("old" -> oldShape _, "new" -> newShape _)) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = f().count()
      println(f"[ab] rep$rep $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
