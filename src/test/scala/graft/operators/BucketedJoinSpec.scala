package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[LayoutOps.bucketize]] — the pre-paid-shuffle contract: two tables
  * bucketed on their join keys with the same bucket count join with NO
  * exchange on either side, and the result is identical to the plain
  * join (bucketing is layout, not semantics).
  */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed join plans zero exchanges and matches the unbucketed result") {
    val base = Files.createTempDirectory("bkt").toString
    val ob = LayoutOps.bucketize(Tables.orders(spark, sf),
      "spec_orders_bkt", s"$base/o", "o_custkey")
    val cb = LayoutOps.bucketize(Tables.customer(spark, sf),
      "spec_customer_bkt", s"$base/c", "c_custkey")

    // hint forces SMJ so the gate can't be satisfied by a broadcast
    val j = ob.hint("merge").join(cb, col("o_custkey") === col("c_custkey"))
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"),
      s"bucketed join must not shuffle or broadcast either side:\n$p")

    val plain = Tables.orders(spark, sf).join(Tables.customer(spark, sf),
      col("o_custkey") === col("c_custkey"))
    assert(j.count() == plain.count())
    val a = j.agg(graft.Det.dsum(col("o_totalprice"))).head().getDouble(0)
    val b = plain.agg(graft.Det.dsum(col("o_totalprice"))).head().getDouble(0)
    assert(a == b, s"bucketed $a vs plain $b")
  }

  test("single-side bucketing still shuffles the other side only") {
    val base = Files.createTempDirectory("bkt1").toString
    val ob = LayoutOps.bucketize(Tables.orders(spark, sf),
      "spec_orders_bkt1", s"$base/o", "o_custkey", nBuckets = 4)
    val cust = Tables.customer(spark, sf)
    val j = ob.hint("merge")
      .join(cust, col("o_custkey") === col("c_custkey"))
    val n = "Exchange hashpartitioning".r
      .findAllIn(j.queryExecution.executedPlan.toString).size
    assert(n == 1, s"expected exactly the customer-side exchange, got $n")
  }
}
