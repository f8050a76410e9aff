package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Phase-timing probe for the bounded-replay harness floor: replays
  * ONE streaming op (the `stream_kleene_replay` shape) with a timer
  * around each phase — session spin-up, fixture staging, stream START
  * (first trigger availability), each micro-batch, stop, read-back —
  * so the "2.5–4 s per replay key" bench band can be attributed to a
  * specific phase instead of guessed at. Run twice in one JVM to see
  * what a warm second key actually pays (the shared-session question).
  *
  * Usage: runMain graft.tools.ReplayProbe <sfDir> [reps]
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bench-style warmup
    graft.SparkEntry.queries("agg_pricing_summary")(spark, sfDir)
      .queryExecution.toRdd.count()

    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // per-trigger duration breakdown straight from the engine
    def listenOn(sess: SparkSession): Unit = sess.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        def onQueryStarted(e: QueryStartedEvent): Unit = ()
        def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        def onQueryProgress(e: QueryProgressEvent): Unit = {
          val d = e.progress.durationMs
          println(s"    [progress] batch ${e.progress.batchId} " +
            s"rows=${e.progress.numInputRows} durationMs=$d")
        }
      })

    (1 to reps).foreach { rep =>
      println(s"— rep $rep —")
      val root = graft.Scratch.dir("graft-replay-probe")
      val src = Files.createDirectories(root.resolve("src")).toString
      val ckpt = root.resolve("ckpt").toString
      val out = root.resolve("out").toString
      val ss = phase("newSession")(spark.newSession())
      listenOn(ss)
      ss.conf.set("spark.sql.shuffle.partitions", 2)
      ss.conf.set("spark.sql.streaming.minBatchesToRetain", 1)
      val base = Tables.events(ss, sfDir)
      val orderCol = unix_micros(col("ts"))
      val chunks = 5
      val (lo, span) = phase("bounds agg") {
        val b = base.agg(min(orderCol).as("lo"), max(orderCol).as("hi")).head()
        (b.getLong(0), math.max(1L, b.getLong(1) - b.getLong(0) + 1L))
      }
      val bucket = least(lit(chunks - 1),
        floor((orderCol - lit(lo)) * lit(chunks.toLong) / lit(span))).cast("int")
      val stage = root.resolve("stage")
      phase("stage write") {
        base.withColumn("ck", bucket).repartition(col("ck"))
          .write.partitionBy("ck").parquet(stage.toString)
      }
      def op(d: DataFrame): DataFrame =
        graft.streaming.StreamOps.cepKleeneStream(
          d, "user_id", "ts", "event_id",
          col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase",
          withinUs = 360L * 60L * 1000000L).toDF()
      val streamed = phase("build plan")(
        op(ss.readStream.schema(base.schema).parquet(src)))
      val q = phase("query start") {
        streamed.coalesce(1).writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt).outputMode("append").start()
      }
      try {
        (0 until chunks).foreach { i =>
          val dir = stage.resolve(s"ck=$i")
          if (Files.isDirectory(dir)) {
            val listing = Files.list(dir)
            try {
              val files = listing.iterator()
              var j = 0
              while (files.hasNext) {
                val f = files.next()
                if (f.getFileName.toString.endsWith(".parquet")) {
                  Files.move(f,
                    java.nio.file.Paths.get(src, s"chunk_${i}_$j.parquet"))
                  j += 1
                }
              }
            } finally listing.close()
            phase(s"micro-batch $i")(q.processAllAvailable())
          }
        }
      } finally phase("query stop")(q.stop())
      phase("read-back count") {
        spark.read.schema(streamed.schema).parquet(out)
          .queryExecution.toRdd.count()
      }
      graft.Scratch.release(root)
    }
    spark.stop()
  }
}
