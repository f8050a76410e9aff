package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Measures the dedup-index serve CO-LOCATION trade (BACKLOG r15 #5):
  * plain `bands/` parquet vs the `bucketBy(bkey)` saved table. For
  * each serve it prints every shuffle exchange in the executed plan
  * with its data size, tagged by whether the exchange's subtree scans
  * the corpus bands table — the plain serve must show a corpus-side
  * exchange, the bucketed serve must NOT (the bucketing IS the join
  * distribution; only the probe side shuffles). Broadcast joins and
  * AQE are disabled so the plan shape reflects the 100 TB regime
  * where no side fits a broadcast. Pair-set equality is asserted.
  * Usage: `DedupServeProbe [sfDir]`. */
object DedupServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, dir)
    val old = docs.filter(col("doc_id") % 2 === 0)
    val nw = docs.filter(col("doc_id") % 2 === 1)

    val plainPath = java.nio.file.Files.createTempDirectory("serve-plain").toString
    graft.operators.DedupOps.saveDedupIndex(old, plainPath)
    val plain = graft.operators.DedupOps
      .dedupAgainstIndex(nw, plainPath, minJaccard = 0.5)

    val bucketPath = java.nio.file.Files.createTempDirectory("serve-bucket").toString
    graft.operators.DedupOps.saveDedupIndexBucketed(old,
      "probe_bands_bucketed", bucketPath)
    val bucketed = graft.operators.DedupOps
      .dedupAgainstIndexBucketed(nw, "probe_bands_bucketed", bucketPath,
        minJaccard = 0.5)

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    def report(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan
      def scans(p: SparkPlan, frag: String): Boolean = p.collectFirst {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(rp =>
              rp.toString.contains(frag)) => f
      }.isDefined
      // CORPUS-ONLY exchange = re-shuffling the saved index itself
      // (subtree scans bands but not the incoming documents batch);
      // that is the one that scales with the corpus and the one the
      // bucketed layout must eliminate. Probe-side and downstream
      // (candidate-sized) exchanges scale with the batch.
      def cls(e: ShuffleExchangeExec): String = {
        val b = scans(e.child, "/bands")
        val d = scans(e.child, "documents.parquet")
        if (b && !d) "CORPUS-ONLY" else if (d && !b) "probe-side"
        else "downstream"
      }
      val ex = plan.collect { case e: ShuffleExchangeExec => e }
      val corpusOnly = ex.filter(e => cls(e) == "CORPUS-ONLY")
      println(f"[dedupserve] $tag: ${ex.size} exchanges, " +
        f"${corpusOnly.size} CORPUS-ONLY " +
        f"(${corpusOnly.map(_.metrics("dataSize").value).sum / 1048576.0}%.2f MiB " +
        "re-shuffled corpus index)")
      ex.foreach { e =>
        println(f"[dedupserve]   exchange dataSize=" +
          f"${e.metrics("dataSize").value / 1048576.0}%8.2f MiB ${cls(e)}")
      }
    }

    val p = pairs(plain)
    val b = pairs(bucketed)
    println(s"[dedupserve] pair sets equal: ${p == b} (${p.size} pairs)")
    report("plain   ", plain)
    report("bucketed", bucketed)
    spark.sql("DROP TABLE IF EXISTS probe_bands_bucketed")
    spark.stop()
  }
}
