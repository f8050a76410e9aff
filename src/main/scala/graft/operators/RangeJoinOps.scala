package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range joins without an equi key. Spark plans a bare
  * `point BETWEEN lo AND hi` join as a broadcast nested loop — every
  * (point, interval) pair compared, one side fully broadcast — which
  * stops scaling the moment neither side is small. The bucket-grid form
  * turns the range predicate into an equi join on a time/number grid
  * (the same family of rewrite DuckDB's IEJoin and AQE's skew handling
  * belong to: make the planner see a hash-joinable key).
  */
object RangeJoinOps {

  /** Points joined to the intervals `[lo, hi)` that contain them.
    *
    * Each interval is replicated to every grid bucket it overlaps; each
    * point carries its own bucket; the join is a plain equi join on the
    * bucket plus the exact containment residual. A qualifying pair
    * meets in exactly one bucket (the point's), so no dedup pass is
    * needed. Column sets of the two inputs must be disjoint.
    *
    * @param bucketWidth grid width in the point column's units — pick
    *   it near the typical interval length so an interval replicates to
    *   ~2 buckets.
    * @note scale: shuffle volume is |points| + |intervals|·avgSpan rows
    *   and the join is hash-partitioned on the bucket — both sides can
    *   be arbitrarily large, no broadcast. Clustered timestamps make hot
    *   buckets; AQE skew-join or a second-level salt splits them. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ints = intervals
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pts = points
      .withColumn("__bucket", floor(col(ptCol) / bucketWidth).cast("long"))
    // shuffle-hash, intervals as build side: the bucket key is
    // low-cardinality with huge equal-key runs, where sort-merge pays a
    // full sort of the point side and then buffers each run anyway
    pts.join(ints.hint("shuffle_hash"), Seq("__bucket"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Declarative BNLJ form — the shape [[pointInInterval]] replaces;
    * kept as the spec cross-check. */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String): DataFrame =
    points.join(intervals,
      col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
}
