package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-side reduction helpers for shuffle-heavy equi-joins. */
object JoinOps {

  /** Semi-join with an explicit bloom-filter pre-filter: build a bloom
    * filter over the dim side's keys (driver-side tree-aggregate, a few
    * MB for millions of keys), broadcast it, drop fact rows that
    * cannot match BEFORE the shuffle, then run the exact semi-join on
    * the survivors. False positives pass the bloom but are removed by
    * the exact join, so the result is identical to a plain semi-join
    * for ANY fpp.
    *
    * This is the manual form of Spark's runtime row-level bloom
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), for when the
    * planner doesn't inject it (non-selective-looking dims, DSv1
    * sources, or a dim computed in the same query). At 100 TB the win
    * is shuffle volume: a 1% -selectivity dim cuts the fact exchange by
    * ~99× at the cost of one broadcast read per row.
    *
    * @note the bloom probe is a JVM lambda (not codegen'd); it sits in
    *   a single narrow filter stage and measures ~ns per row, which is
    *   noise next to the exchange bytes it saves. Keys must be LONG
    *   (the common case for surrogate keys; widen by hashing wider keys
    *   to 64-bit first). */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    val dimKeys = dim.select(col(dimKey).as("__dk")).distinct()
    fact.filter(mightContain(col(factKey)))
      .join(dimKeys, col(factKey) === col("__dk"), "left_semi")
  }
}
