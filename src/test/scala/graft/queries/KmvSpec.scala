package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Accuracy + determinism gates for the KMV / bottom-k distinct sketch
  * (`agg_kmv_mergeable`). Cross-engine arithmetic parity is the
  * oracle's job; here: the estimates actually track the exact distinct
  * counts (within the estimator's standard error), and the aggregator
  * is partition-independent (the property that makes it mergeable).
  */
class KmvSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("KMV estimates within 3 standard errors of exact distinct counts") {
    val est = SparkEntry.queries("agg_kmv_mergeable")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val orders = graft.Tables.orders(spark, sf)
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap +
      ("ALL" -> orders.agg(countDistinct(col("o_custkey"))).head().getLong(0))
    val tol = 3.0 / math.sqrt(256 - 2) // 3σ at k=256 ≈ 18.8%
    exact.foreach { case (scope, n) =>
      val e = est(scope)
      assert(math.abs(e / n - 1.0) <= tol,
        s"$scope: estimate $e vs exact $n outside 3σ")
    }
  }

  test("BottomK sketches are partition-independent and merge = direct") {
    import spark.implicits._
    val kmv = new graft.functions.SketchAggregators.BottomK(64)
    val keys = (1L to 5000L).map(x => (x * 7919L) % 1000L) // dup-heavy
    def sketch(parts: Int): Seq[Long] =
      spark.createDataset(keys).repartition(parts)
        .groupByKey(_ => 0).mapValues(identity)
        .agg(kmv.toColumn.name("sk")).collect().head._2
    val s1 = sketch(1)
    assert(sketch(7) == s1 && sketch(13) == s1,
      "bottom-k must not depend on partitioning")
    assert(s1.length == 64 && s1 == s1.sorted && s1.distinct.length == 64,
      "sketch must be a sorted distinct bottom-k")
  }
}
