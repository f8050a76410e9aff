package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dynamic partition pruning (SURVEY §4): when the partition-column
  * filter is only discoverable THROUGH a join (dim-side predicate), the
  * scan must still skip fact partitions — Catalyst injects a
  * `dynamicpruningexpression` into the scan's PartitionFilters, fed by
  * the broadcast dim. This is the 100 TB complement of
  * `sink_partitioned_prune`'s static pruning: star-schema queries
  * rarely filter the fact directly.
  */
class DynamicPruningSpec extends SparkSpec {

  test("dim-driven join prunes fact partitions dynamically, result exact") {
    val sf = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("dpp").toString
    Tables.orders(spark, sf).write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim: priority attributes; the filter lives on the DIM side only
    val dim = Tables.orders(spark, sf).select(col("o_orderpriority").as("pr"))
      .distinct().withColumn("urgent", col("pr").isin("1-URGENT", "2-HIGH"))
    val j = fact.join(broadcast(dim.filter(col("urgent"))),
        fact("o_orderpriority") === col("pr"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("o_totalprice")).as("tot"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruningexpression in the fact scan:\n$plan")
    // and the pruned plan computes exactly the statically-filtered answer
    val expect = Tables.orders(spark, sf)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("o_totalprice")).as("tot"))
    assert(j.collect().toSeq.map(_.toSeq) == expect.collect().toSeq.map(_.toSeq))
  }
}
