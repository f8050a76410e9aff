package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** `agg_kll_mergeable` — the two properties that make the incremental
  * quantile rollup sound, gated in RANK space (the KLL guarantee is on
  * rank, not value): the merged per-group sketch's quantile estimates
  * sit within the k=1024 rank envelope of the exact distribution, and
  * merging loses almost nothing versus sketching the whole table
  * directly.
  */
class KllMergeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Exact rank of `v` in the column: fraction of rows ≤ v. */
  private def rankOf(v: Double): Double = {
    val li = Tables.lineitem(spark, sf)
    val below = li.filter(col("l_extendedprice") <= v).count().toDouble
    below / li.count().toDouble
  }

  test("merged per-group KLL quantiles land in the rank envelope; merge ≈ direct") {
    val li = Tables.lineitem(spark, sf)
    val Seq(m50, m95) = {
      val sk = li.groupBy("l_returnflag")
        .agg(expr("kll_sketch_agg_double(l_extendedprice, 1024)").as("sk"))
      val r = sk.agg(
        expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5d)"),
        expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.95d)"))
        .head()
      Seq(r.getDouble(0), r.getDouble(1))
    }
    val Seq(d50, d95) = {
      val r = li.agg(
        expr("kll_sketch_get_quantile_double(kll_sketch_agg_double(l_extendedprice, 1024), 0.5d)"),
        expr("kll_sketch_get_quantile_double(kll_sketch_agg_double(l_extendedprice, 1024), 0.95d)"))
        .head()
      Seq(r.getDouble(0), r.getDouble(1))
    }
    // rank gate vs the exact distribution (k=1024 ⇒ ~1.3% rank error;
    // 2% leaves room for the fixture's finite-sample granularity)
    assert(math.abs(rankOf(m50) - 0.50) <= 0.02, s"p50 est $m50 rank ${rankOf(m50)}")
    assert(math.abs(rankOf(m95) - 0.95) <= 0.02, s"p95 est $m95 rank ${rankOf(m95)}")
    // merge ≈ direct, also in rank space (both sketches are randomized,
    // so value equality is not guaranteed — rank proximity is)
    assert(math.abs(rankOf(m50) - rankOf(d50)) <= 0.03, s"$m50 vs $d50")
    assert(math.abs(rankOf(m95) - rankOf(d95)) <= 0.03, s"$m95 vs $d95")
  }
}
