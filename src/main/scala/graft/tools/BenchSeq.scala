package graft.tools
import org.apache.spark.sql.SparkSession

/** In-bench-order probe: replay the EXACT key sequence [[graft.Bench]]
  * runs (same warm-up, same `SparkEntry.queries` iteration order, same
  * local[32]/shuffle=32 session) up to a target key, then time the
  * target — isolating interference a key inherits from its in-bench
  * NEIGHBORS (JIT/GC state, shuffle-file accumulation, codegen cache)
  * that `BenchOne`'s clean-JVM timing cannot see.
  *
  * Usage: `BenchSeq <targetKey> <sfDir> [nBefore=10] [reps=3]` — runs
  * the `nBefore` keys that precede the target in bench order (one
  * pass, untimed beyond a per-key line), then the target `reps` times
  * in place.
  */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val target = args(0); val sfDir = args(1)
    val nBefore = args.lift(2).map(_.toInt).getOrElse(10)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      graft.SparkEntry.queries("agg_pricing_summary")(spark, sfDir)
        .queryExecution.toRdd.count()
      graft.SparkEntry.queries("proj_compute")(spark, sfDir)
        .queryExecution.toRdd.count()
    } catch { case _: Throwable => () }
    val order = graft.SparkEntry.queries.keys.toSeq
    val ti = order.indexOf(target)
    require(ti >= 0, s"unknown key $target")
    val before = order.slice(math.max(0, ti - nBefore), ti)
    println(s"[benchseq] bench-order predecessors: ${before.mkString(", ")}")
    def time(k: String): Double = {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(k)(spark, sfDir)
        .queryExecution.toRdd.count()
      catch { case e: Throwable =>
        println(s"[benchseq] $k FAILED: ${e.getMessage.take(120)}") }
      (System.nanoTime() - t0) / 1e9
    }
    before.foreach(k => println(f"[benchseq]   pre $k: ${time(k)}%.2f s"))
    (1 to reps).foreach(r =>
      println(f"[benchseq] $target rep$r: ${time(target)}%.2f s"))
    spark.stop()
  }
}
