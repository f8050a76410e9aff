package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Flink exposes per-operator metrics/counters; Spark's counterpart for
  * in-query metrics is `Observation` — named aggregates computed inline
  * during the action, no second pass over the data. The pipeline-health
  * counters a production job exports (rows seen, nulls, value mass)
  * ride the same scan the real work does. */
class ObservationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("inline metrics observe the same pass that does the work") {
    val obs = Observation("ingest_health")
    val out = Tables.lineitem(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity").isNull, 1).otherwise(0)).as("null_qty"),
        round(sum(col("l_extendedprice")), 2).as("price_mass"))
      .filter(col("l_quantity") > 25)
      .count() // one action: filter result AND metrics in the same pass
    val m = obs.get
    assert(m("rows_seen") == 60000L, "metrics see pre-filter input")
    assert(m("null_qty") == 0L)
    assert(m("price_mass").asInstanceOf[Double] > 0)
    assert(out < 60000L, "the filter itself did its job")
  }
}
