package graft.tools

import graft.Tables
import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Measures IVF ANN recall against exact brute force, for both the
  * fixed-seed and the Lloyd-refined centroid variants. Usage:
  * `sbt "runMain graft.tools.RecallProbe [sfDir ...]"`. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- dirs) {
      val emb = Tables.embeddings(spark, sf)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("qid", "nbr").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(SimilarityOps.knnCosine(emb, col("vec_id") < 5, k = 10))
      val fixed = pairs(SimilarityOps.knnIvf(
        emb, col("vec_id") < 5, col("vec_id") < 16, nprobe = 4, k = 10))
      val km = pairs(SimilarityOps.knnIvfKmeans(
        emb, col("vec_id") < 5, nCells = 16, refineIters = 2, nprobe = 4, k = 10))
      val pq = pairs(SimilarityOps.knnPq(
        emb, col("vec_id") < 5, m = 8, kCodes = 16, refineIters = 2, k = 10))
      val pqr = pairs(SimilarityOps.knnPq(
        emb, col("vec_id") < 5, m = 8, kCodes = 16, refineIters = 2, k = 10,
        rerank = 100))
      val ivfpq = pairs(SimilarityOps.knnIvfPq(
        emb, col("vec_id") < 5, nCells = 16, cellIters = 2, nprobe = 4,
        m = 8, kCodes = 16, pqIters = 2, k = 10, rerank = 100))
      def r(s: Set[(Long, Long)]): Double = (exact & s).size.toDouble / exact.size
      println(f"RECALL $sf fixed=${r(fixed)}%.3f kmeans=${r(km)}%.3f " +
        f"pq=${r(pq)}%.3f pq_rerank100=${r(pqr)}%.3f ivfpq_rerank100=${r(ivfpq)}%.3f")
      // IVF-PQ sweep: which (nprobe, rerank, kCodes) clears 0.9 cheapest?
      for (np <- Seq(4, 6, 8); rr <- Seq(200, 400); kc <- Seq(16, 32)) {
        val s = pairs(SimilarityOps.knnIvfPq(
          emb, col("vec_id") < 5, nCells = 16, cellIters = 2, nprobe = np,
          m = 8, kCodes = kc, pqIters = 2, k = 10, rerank = rr))
        println(f"SWEEP $sf ivfpq nprobe=$np rerank=$rr kCodes=$kc recall=${r(s)}%.3f")
      }
    }
    spark.stop()
  }
}
