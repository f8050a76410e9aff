package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The bucket-grid range join must reproduce the declarative BNLJ form
  * exactly, at bucket widths below, near, and above the interval
  * length (replication factors ~8, ~2, ~1). */
class RangeJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("bucket-grid point-in-interval equals the BNLJ form at several widths") {
    val day = 86400L
    val secs = (c: org.apache.spark.sql.Column) => unix_seconds(c.cast("timestamp"))
    val ints = Tables.orders(spark, sf).filter(col("o_totalprice") > 480000)
      .select(col("o_orderkey"), secs(col("o_orderdate")).as("lo"),
        (secs(col("o_orderdate")) + 7 * day).as("hi"))
    val pts = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        secs(col("l_shipdate")).as("pt"))
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("o_orderkey", "l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bnlj = key(RangeJoinOps.pointInIntervalJoin(pts, ints, "pt", "lo", "hi"))
    assert(bnlj.nonEmpty, "fixture should produce range matches")
    for (w <- Seq(day, 7 * day, 30 * day)) {
      val grid = key(RangeJoinOps.pointInInterval(pts, ints, "pt", "lo", "hi", w))
      assert(grid == bnlj, s"bucketWidth=$w diverged")
    }
  }
}
