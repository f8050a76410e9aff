package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Accuracy gate for the portable histogram quantiles
  * (`agg_hist_mergeable`): each estimate must sit within one bin width
  * ABOVE the exact percentile (the estimate is the reached bin's upper
  * edge, so it can never undershoot), per group and merged. */
class HistMergeableSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val binW = 120000.0 / 1024

  test("p50/p95 within one bin width above the exact percentiles") {
    val est = SparkEntry.queries("agg_hist_mergeable")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val li = graft.Tables.lineitem(spark, sf)
    def exact(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.agg(
        expr("percentile(l_extendedprice, 0.5)"),
        expr("percentile(l_extendedprice, 0.95)")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val scopes = est.keySet
    assert(scopes.contains("ALL") && scopes.size >= 4)
    scopes.foreach { s =>
      val (e50, e95) = est(s)
      val (x50, x95) =
        if (s == "ALL") exact(li) else exact(li.filter(col("l_returnflag") === s))
      // one bin width either side: Spark's exact percentile
      // interpolates between order statistics, so it may sit a hair
      // past the reached bin's edge in either direction
      assert(math.abs(e50 - x50) <= binW, s"$s p50: est $e50 vs exact $x50")
      assert(math.abs(e95 - x95) <= binW, s"$s p95: est $e95 vs exact $x95")
    }
  }
}
