package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SCALE.md: pre-bucketed co-located join — when both sides are bucketed
  * on the join key with the same bucket count, the sort-merge join reads
  * buckets directly and the plan carries NO shuffle exchange. This is
  * the 100 TB pattern for repeatedly-joined fact/dim tables.
  */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-by-key join plans without a shuffle exchange") {
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcast)
    spark.conf.set(bcast, "-1") // force SMJ so bucketing is observable
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      Tables.orders(spark, sf).write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey").saveAsTable("b_orders")
      Tables.customer(spark, sf).write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey").saveAsTable("b_customer")

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      // the aggregation after the join still exchanges on c_mktsegment —
      // what bucketing must remove is any exchange on the JOIN keys
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join must not shuffle on the join key:\n$plan")
      assert("Bucketed: true".r.findAllIn(plan).size == 2,
        s"both scans must read buckets directly:\n$plan")
      // and it still computes the right thing
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets == plain)
    } finally {
      spark.conf.set(bcast, prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
