package graft.tools
import org.apache.spark.sql.SparkSession

/** Evidence probe (r3): is the shingle BUILD worth a native expression
  * after poly_hash went native? Measured NO — the full tokenize+
  * shingle+hash pass is 0.6-0.9 s steady-state at sf0.1 (260k shingle
  * rows); the dedup keys' remaining time lives in their joins/aggs, so
  * a ShingleHashes expression would save ~0.3 s across the whole
  * family. Negative result recorded; revisit only if corpus token
  * counts grow 10×. */
object ShProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.operators.DedupOps.hashedShingles(docs).queryExecution.toRdd.count()
      println(f"[shprobe] rep$r: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
