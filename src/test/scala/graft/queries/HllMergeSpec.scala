package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** `agg_hll_mergeable` — the two properties that make the incremental
  * rollup sound: merging per-partition sketches tracks the whole-table
  * sketch closely (register-max is associative, but DataSketches'
  * sparse→dense mode transition lets the union's estimator differ by a
  * hair at small cardinalities — measured 1488 vs 1492 on the
  * fixture), and the estimate lands within HLL's error envelope of the
  * exact distinct count.
  */
class HllMergeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("merged per-group sketches equal the direct whole-table estimate, within 5% of exact") {
    val ord = Tables.orders(spark, sf)
    val merged = ord.groupBy("o_orderstatus")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    val direct = ord
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))))
      .head().getLong(0)
    assert(math.abs(merged - direct).toDouble / direct <= 0.01,
      s"partition-merge must track the direct sketch within 1%: $merged vs $direct")
    val exact = ord.select(count_distinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"estimate $merged vs exact $exact exceeds 5%")
  }
}
