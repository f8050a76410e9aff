package graft.tools

import graft.{Det, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the cost of the Det decimal-sum chain vs raw double sums on
  * the TPC-H Q1 shape — evidence for/against a custom decimal
  * aggregate. `sbt "runMain graft.tools.DecProbe /root/testdata/sf0.1"`. */
object DecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp_ntz"))
    def run(label: String)(agg: org.apache.spark.sql.DataFrame): Unit = {
      agg.queryExecution.toRdd.count() // warm
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => agg.queryExecution.toRdd.count())
      println(f"$label: ${(System.nanoTime() - t0) / 3e9}%.3f s/run")
    }
    run("double sums") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum("l_quantity"), sum("l_extendedprice"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))),
        avg("l_quantity"), avg("l_discount"), count(lit(1)))
    }
    run("Det decimal sums") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        Det.dsum(col("l_quantity")), Det.dsum(col("l_extendedprice")),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))),
        Det.davg(col("l_quantity")), Det.davg(col("l_discount")), count(lit(1)))
    }
    spark.stop()
  }
}
