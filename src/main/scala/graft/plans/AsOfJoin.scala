package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.{Column, DataFrame}

/** Native as-of join (SURVEY §2.3 J7; spark_guide §"Custom operator").
  *
  * Semantics: left row ⟕ the single right row with the same key and the
  * greatest `(rightTime, rightTie)` such that `rightTime <= leftTime`
  * (left-outer: unmatched left rows keep nulls). Exactly the
  * `row_number() = 1` window emulation — but the emulation first joins
  * every left row to ALL earlier right rows of its key (quadratic
  * intermediate per key), while this operator hash-partitions both
  * sides on the key, sorts within partitions, and runs a linear
  * two-pointer merge: the right cursor only ever advances.
  *
  * Key/time/tie expressions must evaluate to 64-bit values
  * (LongType or TimestampType), which covers the fixture schema and
  * typical id/event-time layouts.
  *
  * @note scale: cost is one co-partitioned shuffle + sort per side and
  *   an O(n+m) merge per partition — the same shape as a sort-merge
  *   join; no intermediate blow-up regardless of per-key history size.
  *   Skewed keys split fine: each left row needs only the latest right
  *   row at or before it, so AQE skew-split on the sorted runs is safe.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  // rows stay partitioned exactly as the left child delivered them —
  // without this, downstream key-based operators would re-shuffle
  // already co-partitioned output (UnknownPartitioning default)
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val fullOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(leftKey, leftTime), leftOut)
      val rProj = UnsafeProjection.create(Seq(rightKey, rightTime), rightOut)
      val resultProj = UnsafeProjection.create(fullOut, fullOut)
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var candidate: InternalRow = _ // copied latest right row
        private var candKey: Long = 0L
        private var hasCand = false
        private var rRow: InternalRow = _ // lookahead (NOT copied)
        private var rKey = 0L
        private var rTime = 0L
        private var rValid = false
        advanceRight()

        private def advanceRight(): Unit = {
          // skip right rows with null key or time: SQL join semantics —
          // NULL never matches (they sort first, so skipping preserves
          // the cursor's monotonicity)
          rValid = false; rRow = null
          while (!rValid && rIter.hasNext) {
            rRow = rIter.next()
            val k = rProj(rRow)
            if (!k.isNullAt(0) && !k.isNullAt(1)) {
              rKey = k.getLong(0); rTime = k.getLong(1); rValid = true
            }
          }
          if (!rValid) rRow = null
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lk = lProj(lRow)
          if (lk.isNullAt(0) || lk.isNullAt(1)) {
            // null probe key/time matches nothing (left-outer nulls)
            return resultProj(joined(lRow, nullRight))
          }
          val lKey = lk.getLong(0); val lTime = lk.getLong(1)
          // consume right rows at or before (lKey, lTime); the last one
          // consumed with rKey == lKey is the as-of match
          while (rValid && (rKey < lKey || (rKey == lKey && rTime <= lTime))) {
            if (rKey == lKey) {
              candidate = rRow.copy(); candKey = rKey; hasCand = true
            }
            advanceRight()
          }
          val matched = hasCand && candKey == lKey
          resultProj(joined(lRow, if (matched) candidate else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOfJoinOps.asofJoin(probe, build, ...)`. Requires the
  * planner strategy registered via [[graft.functions.GraftExtensions]]. */
object AsOfJoinOps {
  import org.apache.spark.sql.types.{DataType, LongType, TimestampType, TimestampNTZType}

  private def require64Bit(e: Expression, what: String): Unit = {
    val ok: DataType => Boolean = {
      case LongType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    require(ok(e.dataType),
      s"asofJoin $what must be LongType or TimestampType (64-bit), got ${e.dataType} — " +
        "a narrower type would be read as garbage by the merge")
  }

  def asofJoin(probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: Column,
      probeTime: Column, buildTime: Column, buildTie: Column): DataFrame = {
    val exprs = Seq(
      "probeKey" -> PlanBridge.expression(probeKey),
      "buildKey" -> PlanBridge.expression(buildKey),
      "probeTime" -> PlanBridge.expression(probeTime),
      "buildTime" -> PlanBridge.expression(buildTime),
      "buildTie" -> PlanBridge.expression(buildTie))
    exprs.foreach { case (w, e) => require64Bit(e, w) }
    val Seq(pk, bk, pt, bt, tie) = exprs.map(_._2)
    val node = AsOfJoinNode(
      probe.queryExecution.analyzed, build.queryExecution.analyzed,
      pk, bk, pt, bt, tie)
    PlanBridge.ofRows(probe.sparkSession, node)
  }
}
