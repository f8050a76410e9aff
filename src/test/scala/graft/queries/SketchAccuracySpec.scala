package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 A4: approx_count_distinct is engine-specific (sketch), so
  * it carries no DuckDB-hashed key — its contract is relative error vs
  * the exact count, asserted here at the default rsd and a tighter one.
  */
class SketchAccuracySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("A4 approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.lineitem(spark, sf)
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey")).as("approx"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx_tight")).head()
    val exact = row.getLong(0).toDouble
    assert(math.abs(row.getLong(1) - exact) / exact <= 0.05,
      s"default rsd: ${row.getLong(1)} vs $exact")
    assert(math.abs(row.getLong(2) - exact) / exact <= 0.02,
      s"rsd=0.01: ${row.getLong(2)} vs $exact")
  }
}
