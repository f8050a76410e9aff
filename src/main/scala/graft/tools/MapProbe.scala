package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost breakdown for the scalar_map shape: full query vs no-sort vs
  * no-HOF variants. `sbt "runMain graft.tools.MapProbe /root/testdata/sf0.1"`. */
object MapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        map(lit("qty"), col("l_quantity"), lit("disc"), col("l_discount")).as("m"),
        map_from_arrays(array(lit("rf"), lit("ls")),
          array(col("l_returnflag"), col("l_linestatus"))).as("sm"))
    def proj = base.select(col("l_orderkey"), col("l_linenumber"),
      element_at(col("m"), "qty").as("qty"),
      element_at(col("m"), "disc").as("disc"),
      size(col("m")).cast("int").as("nkeys"),
      array_join(map_keys(col("m")), ",").as("ks"),
      element_at(col("sm"), "rf").as("rf"),
      size(map_filter(col("m"), (_, v) => v > 1)).cast("int").as("nbig"),
      aggregate(map_values(col("m")), lit(0.0), (a, x) => a + x).as("vsum"))
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count()
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => df.queryExecution.toRdd.count())
      println(f"$label: ${(System.nanoTime() - t0) / 3e9}%.3f s/run")
    }
    time("full (proj + sort)")(proj.orderBy("l_orderkey", "l_linenumber"))
    time("proj only")(proj)
    time("no HOFs + sort")(proj.drop("nbig", "vsum").orderBy("l_orderkey", "l_linenumber"))
    time("maps only, no proj")(base)
    spark.stop()
  }
}
