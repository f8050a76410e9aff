package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Measures whether [[graft.operators.SimilarityOps.knnIvfSaved]]'s
  * probed-cell join leaves a CORPUS-SIDED exchange as nprobe grows —
  * the measure-first gate on a bucketed `assigned/` table (BACKLOG r16
  * #5: the dedup-bands result suggested the same trade, but the ANN
  * serve is differently shaped: the assigned table is partition-pruned
  * to the probed cells and the probe side is an explicitly-broadcast
  * LocalRelation, so the corpus should never shuffle AT ANY nprobe —
  * what grows is the pruned SCAN, by design). Broadcast-by-threshold
  * and AQE are disabled as in [[DedupServeProbe]] so nothing hides an
  * exchange; the explicit broadcast() hint in the serve path is the
  * design under test, not a measurement artifact. For each nprobe it
  * prints every shuffle exchange with its size + classification and
  * the assigned-table scan's file count/bytes (the pruning lever).
  * Usage: `AnnServeProbe [sfDir]`. */
object AnnServeProbe {
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

    val emb = graft.Tables.embeddings(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("ann-probe").toString
    graft.operators.SimilarityOps.saveIvfIndex(emb, path,
      nCells = 16, iters = 2)

    def scans(p: SparkPlan, frag: String): Boolean = p.collectFirst {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(frag)) => f
    }.isDefined

    Seq(1, 4, 16).foreach { nprobe =>
      val served = graft.operators.SimilarityOps.knnIvfSaved(emb, path,
        isQuery = col("vec_id") < 5, nprobe = nprobe, k = 10)
      val n = served.collect().length // collect() runs THIS plan instance
      val plan = served.queryExecution.executedPlan
      // CORPUS-SIDED = the exchange re-distributes the assigned table
      // ITSELF (scans /assigned with no join below it — the exchange
      // the bucketed dedup layout eliminated); an exchange ABOVE the
      // probe join carries candidates and scales with nprobe×cell, not
      // with the corpus.
      def joins(p: SparkPlan): Boolean = p.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isDefined
      def cls(e: ShuffleExchangeExec): String =
        if (scans(e.child, "/assigned") && !joins(e.child)) "CORPUS-SIDED"
        else "candidate/downstream"
      val ex = plan.collect { case e: ShuffleExchangeExec => e }
      val corpus = ex.filter(e => cls(e) == "CORPUS-SIDED")
      println(f"[annserve] nprobe=$nprobe%2d rows=$n: ${ex.size} exchanges, " +
        f"${corpus.size} CORPUS-SIDED " +
        f"(${corpus.map(_.metrics("dataSize").value).sum / 1048576.0}%.2f MiB " +
        "re-shuffled assigned table)")
      ex.foreach { e =>
        println(f"[annserve]   exchange dataSize=" +
          f"${e.metrics("dataSize").value / 1048576.0}%8.2f MiB ${cls(e)}")
      }
      plan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("/assigned")) =>
          println(f"[annserve]   assigned scan: " +
            f"files=${f.metrics("numFiles").value} " +
            f"bytes=${f.metrics("filesSize").value / 1024.0}%.1f KiB " +
            "(partition-pruned to the probed cells)")
      }
    }
    spark.stop()
  }
}
