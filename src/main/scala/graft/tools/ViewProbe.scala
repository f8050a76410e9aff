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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[viewprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
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
      t("maintainViewStream total") {
        graft.streaming.ViewMaintain.maintainViewStream(spark, oldS,
            deltas, orderCol = "l_orderkey", chunks = 3,
            groupCols = Seq("pk"), sumCols = Seq("qty_c"),
            minMaxCols = Seq("price_c"))
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
