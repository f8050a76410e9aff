package graft.tools
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val key = args(0); val sfDir = args(1); val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.extensions","graft.functions.GraftExtensions")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count()
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      // toRdd: run the query's own plan; .count() would prune the work
      val n = graft.SparkEntry.queries(key)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[benchone] $key rep$r: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
