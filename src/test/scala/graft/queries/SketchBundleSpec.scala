package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The one-scan multi-sketch bundle (`agg_sketch_bundle`): both
  * distinct estimators track the exact counts (and each other), the
  * histogram median sits within a bin width of the exact percentile,
  * and the whole bundle aggregates in a single exchange. */
class SketchBundleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("bundle estimates track exact distincts and median per group") {
    val out = SparkEntry.queries("agg_sketch_bundle")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(4), r.getDouble(5))).toMap
    val orders = graft.Tables.orders(spark, sf)
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("nd"),
        expr("percentile(o_totalprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val binW = 600000.0 / 1024
    exact.foreach { case (g, (nd, p50)) =>
      val (kmv, hll, p50e) = out(g)
      assert(math.abs(kmv / nd - 1.0) <= 3.0 / math.sqrt(254), s"$g kmv $kmv vs $nd")
      assert(math.abs(hll / nd - 1.0) <= 3.0 * 1.04 / math.sqrt(256), s"$g hll $hll vs $nd")
      assert(math.abs(p50e - p50) <= binW, s"$g p50 $p50e vs $p50")
    }
  }

  test("all three sketches ride one exchange (single-scan profile shape)") {
    val plan = SparkEntry.queries("agg_sketch_bundle")(spark, sf)
      .queryExecution.executedPlan.toString
    // one partial+final agg pair over a single scan — no per-sketch
    // extra input passes
    val aggScans = "Scan parquet".r.findAllIn(plan).size
    assert(aggScans == 1, s"bundle must scan orders once, saw $aggScans scans")
    assert("ObjectHashAggregate|HashAggregate".r.findFirstIn(plan).isDefined)
  }
}
