package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** `agg_theta_setops` / `agg_topk_mergeable` accuracy gates: theta
  * set-operation estimates track the exact distinct counts, and the
  * combined top-k state reproduces the exact global heavy hitters
  * (maxItemsTracked far above the fixture's distinct-user count makes
  * the sketch exact there, so the gate is equality, not a band).
  */
class ThetaTopkSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("theta union/intersection/difference estimates within 5% of exact") {
    val ev = Tables.events(spark, sf)
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val (c, p) = (users("click"), users("purchase"))
    val est = graft.SparkEntry.queries("agg_theta_setops")(spark, sf).head()
    val (eu, ei, ed) = (est.getLong(0).toDouble, est.getLong(1).toDouble,
      est.getLong(2).toDouble)
    def ok(e: Double, exact: Int, what: String) = assert(
      math.abs(e - exact) <= math.max(1.0, 0.05 * exact),
      s"$what: estimate $e vs exact $exact")
    ok(eu, (c ++ p).size, "union")
    ok(ei, (c & p).size, "intersection")
    ok(ed, (c -- p).size, "difference")
  }

  test("combined approx_top_k equals the exact global top-5") {
    val exact = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(5).collect().map(r => (r.getLong(0), r.getLong(1)))
    val est = graft.SparkEntry.queries("agg_topk_mergeable")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // counts must match exactly (sketch is exact below maxItemsTracked);
    // item order can differ only among equal counts
    assert(est.map(_._2).toSeq.sorted == exact.map(_._2).toSeq.sorted,
      s"est ${est.toSeq} vs exact ${exact.toSeq}")
    val exactByCount = exact.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // every estimated item's true count equals its reported count
    val trueCounts = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    est.foreach { case (uid, n) =>
      assert(trueCounts(uid) == n, s"user $uid reported $n true ${trueCounts(uid)}")
    }
    assert(est.length == 5)
    // suppress unused warning path: exactByCount retained for debugging
    assert(exactByCount.values.map(_.size).sum == 5)
  }
}
