package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Accuracy + mergeability gates for the portable HyperLogLog
  * (`agg_hll_portable`). Cross-engine register/estimate parity is the
  * oracle's job; here: the raw estimates track exact distinct counts
  * within HLL's standard error in its working regime (n ≳ 2.5·m), and
  * the register aggregator is partition-independent (what makes the
  * per-group → ALL rollup legitimate).
  */
class HllPortableSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("raw HLL estimates within 3 standard errors of exact distinct counts") {
    val out = SparkEntry.queries("agg_hll_portable")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val orders = graft.Tables.orders(spark, sf)
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap +
      ("ALL" -> orders.agg(countDistinct(col("o_custkey"))).head().getLong(0))
    // fixture groups have ~1450 distincts at m=256 → n/m ≈ 5.7, inside
    // the raw-estimate regime (no linear-counting branch needed)
    val tol = 3.0 * 1.04 / math.sqrt(256) // 3σ ≈ 19.5%
    exact.foreach { case (scope, n) =>
      assert(n >= 2.5 * 256, s"$scope outside the raw regime (n=$n)")
      val e = out(scope)
      assert(math.abs(e / n - 1.0) <= tol,
        s"$scope: estimate $e vs exact $n outside 3σ")
    }
  }

  test("HLL registers are partition-independent and merge = direct") {
    import spark.implicits._
    val hll = new graft.functions.SketchAggregators.HllRegisters(8)
    val keys = (1L to 20000L).map(x => (x * 7919L) % 3000L) // dup-heavy
    def regs(parts: Int): Seq[Long] =
      spark.createDataset(keys).repartition(parts)
        .groupByKey(_ => 0).mapValues(identity)
        .agg(hll.toColumn.name("sk")).collect().head._2
    val r1 = regs(1)
    assert(regs(7) == r1 && regs(13) == r1,
      "registers must not depend on partitioning")
    assert(r1.length == 256 && r1.forall(r => r >= 0 && r <= 24))
    // elementwise max of two half-sketches equals the direct sketch
    val half1 = spark.createDataset(keys.take(10000))
      .groupByKey(_ => 0).mapValues(identity)
      .agg(hll.toColumn.name("sk")).collect().head._2
    val half2 = spark.createDataset(keys.drop(10000))
      .groupByKey(_ => 0).mapValues(identity)
      .agg(hll.toColumn.name("sk")).collect().head._2
    val merged = half1.zip(half2).map { case (a, b) => math.max(a, b) }
    assert(merged == r1, "elementwise max must equal the direct sketch")
  }
}
