package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stress adjudication for the group-quantifier CEP keys: at k×
  * event DENSITY the relaxed-contiguity chain's candidate set grows
  * ~(k·band-fan-out)^slots — the documented cliff of every unrolled
  * chain — and the `within` band is the lever that returns it to
  * budget. This probe measures the same group pattern on a blown
  * fixture at the ORIGINAL band and at band/k, each under a
  * wall-clock budget (a run past budget is killed and reported as
  * `>budget`). The 6-slot MIXED chain (cep_group_mixed's shape) runs
  * last: there the construction-time density guard must FIRE at k×
  * density instead of the job running away, and the band/k lever must
  * bring it back under the cap. Usage:
  * `CepStressProbe <dir> [budgetSec] [k]`. */
object CepStressProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/stress10")
    val budgetSec = args.lift(1).map(_.toInt).getOrElse(300)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    require(k >= 1 && k <= 360,
      s"density factor k=$k outside 1..360 — 360/k would truncate to a " +
        "degenerate 0-minute band and the probe would measure nothing")
    // integer division truncates (k=7 → 51 min, not 51.4) — report the
    // band actually used so the printed tag never overstates the lever
    val bandK = math.max(1, 360 / k)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val grp = Seq("click" -> (col("event_type") === "click"),
      "view" -> (col("event_type") === "view"))
    def run(tag: String, withinMin: Int): Unit = {
      val t0 = System.nanoTime()
      val fut = scala.concurrent.Future {
        graft.streaming.CepOps.cepGroupTimes(
          graft.Tables.events(spark, dir), "user_id", "ts", "event_id",
          grp, n = 2, within = s"$withinMin minutes").count()
      }(scala.concurrent.ExecutionContext.global)
      try {
        val n = scala.concurrent.Await.result(fut,
          scala.concurrent.duration.Duration(budgetSec, "s"))
        println(f"[cepstress] $tag (within=$withinMin min): " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelAllJobs()
          println(s"[cepstress] $tag (within=$withinMin min): " +
            s">$budgetSec s (killed at budget)")
      }
    }
    run(s"${k}x density, original band", 360)
    run(s"${k}x density, band/k", bandK)
    // the 6-slot MIXED chain (cep_group_mixed's shape) is where the
    // measured cliff lives (>300 s at 10x): the construction-time
    // density guard must FIRE here instead of letting the job run
    // away, and the band/k lever must bring it back under the cap
    def runMixed(tag: String, withinMin: Int): Unit = {
      val ev = graft.Tables.events(spark, dir).filter(col("user_id") < 30)
      val t0 = System.nanoTime()
      try {
        val n = graft.streaming.CepOps.cepGroupTimesMixed(ev, "user_id",
          "ts", "event_id",
          pre = Seq("signup" -> (col("event_type") === "signup")),
          group = Seq("hi" -> (col("value") >= 50),
            "lo" -> (col("value") < 50)),
          n = 2,
          post = Seq("purchase" -> (col("event_type") === "purchase")),
          within = s"$withinMin minutes").count()
        println(f"[cepstress] mixed6 $tag (within=$withinMin min): " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
      } catch {
        case e: IllegalArgumentException
            if e.getMessage.contains("density guard") =>
          println(s"[cepstress] mixed6 $tag (within=$withinMin min): " +
            s"GUARD FIRED — ${e.getMessage.linesIterator.next()}")
      }
    }
    runMixed(s"${k}x density, original band", 1440)
    runMixed(s"${k}x density, band/k", math.max(1, 1440 / k))
    spark.stop()
  }
}
