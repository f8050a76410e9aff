package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ClassicConversions, ExpressionUtils}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Access bridge into `private[sql]` Spark internals, in the standard
  * OSS-extension location (a subpackage of `org.apache.spark.sql`).
  * Needed to (a) materialize a DataFrame over a custom LogicalPlan and
  * (b) extract the Catalyst `Expression` behind a public `Column` —
  * both required by graft's custom operators ([[graft.plans.AsOfJoinNode]]).
  * Kept to exactly these two trampolines; everything else in graft uses
  * only public API.
  */
object PlanBridge {

  /** DataFrame over an arbitrary (resolved) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The Catalyst expression behind a Column (Spark 4 wraps ColumnNode). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
