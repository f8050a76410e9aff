package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the streaming view-maintenance keys: times
  * the fixture (snapshot window + rowDeltas changelog) separately from
  * the replay loop, so harness-floor vs compaction-cost arguments rest
  * on measurement instead of guesswork. */
object ViewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // physical write mass: bytes the executors actually wrote — the
    // honest "rewrite cost" metric (wall time at sf0.1 is dominated by
    // fixture recompute + per-batch floor; hard links write nothing)
    val bytesWritten = new java.util.concurrent.atomic.AtomicLong()
    // per-phase job-wall attribution: ViewMaintain labels its actions
    // via setJobDescription ("vm: <phase>"); sum job wall per label
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val phaseMs = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val phaseJobs = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            bytesWritten.addAndGet(e.taskMetrics.outputMetrics.bytesWritten)
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("(none)")
          val label = if (d.startsWith("vm: ")) d.stripPrefix("vm: ") else "other"
          jobStart.put(e.jobId, (e.time, label))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStart.remove(e.jobId)
          if (s != null) {
            phaseMs.merge(s._2, e.time - s._1, (a, b) => a + b)
            phaseJobs.merge(s._2, 1, (a, b) => a + b)
          }
        }
      })
    def dumpPhases(): Unit = {
      import scala.jdk.CollectionConverters._
      phaseMs.asScala.toSeq.sortBy(-_._2).foreach { case (l, ms) =>
        println(f"[viewprobe]   phase $l%-16s ${ms / 1000.0}%7.2f s  (${phaseJobs.get(l)} jobs)")
      }
      phaseMs.clear(); phaseJobs.clear()
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val b0 = bytesWritten.get()
      val r = f
      println(f"[viewprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        f"  (wrote ${(bytesWritten.get() - b0) / 1048576.0}%.1f MiB)")
      r
    }
    // warm the session on a trivial scan
    graft.Tables.lineitem(spark, sfDir).count()
    (1 to 2).foreach { rep =>
      println(s"[viewprobe] === rep $rep ===")
      val (oldS, newS) = t("snapshots construct+count") {
        val li0 = graft.Tables.lineitem(spark, sfDir).select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          round(col("l_quantity") * 100).cast("long").as("qty_c"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
        val li = li0.withColumn("rid", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("l_orderkey", "l_linenumber")
            .orderBy("price_c", "qty_c", "l_partkey")))
        val o = li.filter(col("l_orderkey") % 7 =!= 0)
          .select(col("l_orderkey"), col("l_linenumber"), col("rid"),
            col("l_partkey").as("pk"), col("qty_c"), col("price_c"))
        val n = li.filter(col("l_orderkey") % 5 =!= 0)
          .select(col("l_orderkey"), col("l_linenumber"), col("rid"),
            when(col("l_orderkey") % 9 === 0, col("l_partkey") % 100 + 1)
              .otherwise(col("l_partkey")).as("pk"),
            (col("qty_c") + when(col("l_orderkey") % 3 === 0, lit(100L))
              .otherwise(lit(0L))).as("qty_c"),
            col("price_c"))
        o.count(); n.count()
        (o, n)
      }
      val deltas = t("rowDeltas count") {
        val d = graft.operators.ViewOps.rowDeltas(oldS, newS,
          keyCols = Seq("l_orderkey", "l_linenumber", "rid"),
          valCols = Seq("pk", "qty_c", "price_c"))
        println(s"[viewprobe]   deltas rows: ${d.count()}")
        d
      }
      // measured r16: shufflePartitions 8/32/2 on this fixture land
      // within noise (13.8/14.6/14.1 s warm) — parallelism is NOT the
      // lever; the per-batch job orchestration is. Trace it per phase.
      t("maintainViewStream sp=8  total") {
        graft.streaming.ViewMaintain.maintainViewStream(spark, oldS,
            deltas, orderCol = "l_orderkey", chunks = 3,
            groupCols = Seq("pk"), sumCols = Seq("qty_c"),
            minMaxCols = Seq("price_c"))
          .queryExecution.toRdd.count()
      }
      dumpPhases()
    }

    // SKEWED-CHURN face: the bench fixture above rewrites 75% of the
    // base (every bucket touched — bucketing can only add write
    // fan-out there, which is why the bench keys stay flat). Here the
    // changelog touches THREE part keys out of ~20k, the regime the
    // bucketed layout exists for: compaction must reconcile+rewrite
    // only the touched buckets and hard-link the rest, so the
    // maintain total drops toward the harness floor while the flat
    // form still pays a full O(base) snapshot rewrite per batch.
    println("[viewprobe] === skewed churn: flat vs bucketed snapshots ===")
    val li = graft.Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_partkey").as("pk"),
      round(col("l_quantity") * 100).cast("long").as("qty_c"),
      round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .withColumn("rid", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey", "l_linenumber")
          .orderBy("price_c", "qty_c", "pk")))
    val oldSk = li.select("l_orderkey", "l_linenumber", "rid", "pk",
      "qty_c", "price_c")
    val newSk = oldSk.withColumn("qty_c",
      when(col("pk") <= 3, col("qty_c") + 100L).otherwise(col("qty_c")))
    val dSk = graft.operators.ViewOps.rowDeltas(oldSk, newSk,
      keyCols = Seq("l_orderkey", "l_linenumber", "rid"),
      valCols = Seq("pk", "qty_c", "price_c"))
    println(s"[viewprobe]   skewed deltas rows: ${dSk.count()} " +
      s"(base ${oldSk.count()})")
    (1 to 1).foreach { rep =>
      println(s"[viewprobe] --- skewed rep $rep ---")
      def run(label: String, buckets: Option[Int], every: Int = 1): Unit =
        t(label) {
          graft.streaming.ViewMaintain.maintainViewStream(spark, oldSk,
              dSk, orderCol = "l_orderkey", chunks = 3,
              groupCols = Seq("pk"), sumCols = Seq("qty_c"),
              minMaxCols = Seq("price_c"), compactEvery = every,
              snapshotBuckets = buckets)
            .queryExecution.toRdd.count()
        }
      run("flat            maintain", None)
      dumpPhases()
      run("bucketed(32)    maintain", Some(32)) // the bench key's layout
      dumpPhases()
    }
    spark.stop()
  }
}
