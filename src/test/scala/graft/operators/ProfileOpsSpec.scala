package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Expectation-validation semantics pinned on hand-built rows: one-scan
  * stacked counters, and the FK rule that a NULL child key is an orphan.
  */
class ProfileOpsSpec extends SparkSpec {

  test("rowChecks counts each expectation's violations in one stacked report") {
    import spark.implicits._
    val df = Seq((1, "a", 5.0), (2, "b", -1.0), (3, "zz", 0.0), (4, "a", 99.0))
      .toDF("id", "code", "v")
    val got = ProfileOps.rowChecks(df, Seq(
        "code_domain" -> !col("code").isin("a", "b"),
        "v_nonnegative" -> (col("v") < 0),
        "v_cap_50" -> (col("v") > 50)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("code_domain" -> 1L, "v_nonnegative" -> 1L, "v_cap_50" -> 1L))
  }

  test("rowChecks runs all expectations in a single aggregate (no per-check scan)") {
    import spark.implicits._
    val df = Seq((1, 2.0), (2, 3.0)).toDF("id", "v")
    val plan = ProfileOps.rowChecks(df, Seq(
        "a" -> (col("v") > 1), "b" -> (col("v") > 2), "c" -> (col("id") < 0)))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan ".r.findAllIn(plan).size <= 1, plan)
  }

  test("fkOrphans counts missing parents AND null child keys") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = ProfileOps.fkOrphans("fk_check", child, parent, "fk", "pk")
      .collect().head
    assert(got.getString(0) == "fk_check")
    assert(got.getLong(1) == 2L, "99 (missing parent) + null key")
  }
}
