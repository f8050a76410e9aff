package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed event streams — the batch face of
  * sessionization generalized to explicit `[start, end)` intervals
  * (coverage windows, on-call shifts, lease/validity ranges).
  */
object IntervalOps {

  /** Merge overlapping-or-touching intervals per key (the classic
    * gaps-and-islands reduction): an interval starts a new island iff
    * its start exceeds the running max end of all earlier intervals in
    * the same key. Emits one row per island: `(key…, island start,
    * island end, n_merged)`.
    *
    * Works on any orderable numeric/timestamp start/end columns;
    * intervals that merely touch (`start == prev end`) are merged —
    * pass already-exclusive ends if touching must not merge.
    *
    * @note scale: one shuffle on the key, then two window passes and a
    *   grouped agg on the SAME partitioning — Catalyst plans a single
    *   exchange. Running-max-end is O(1) state per row; no per-key
    *   buffering, so a key with millions of intervals streams through
    *   the sort rather than materializing. */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col(startCol), col(endCol))
    // running max end over STRICTLY earlier rows: this row overlaps the
    // island built so far iff its start <= that max
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val islands = df
      .withColumn("__pmax", max(col(endCol)).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(keys :+ col("__island"): _*)
      .agg(min(col(startCol)).as("ivl_start"),
        max(col(endCol)).as("ivl_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  /** Per-event session-id assignment — the PROJECTION face of gap
    * sessionization (the aggregated face is the session-window ops):
    * every row keeps its columns and gains `session_id`, numbering its
    * key's sessions 1..k in time order; a session breaks when the gap
    * from the previous event exceeds `gapUs`. This is what downstream
    * per-session joins/groupBys key on.
    *
    * @note scale: one shuffle on the key; both windows (lag + running
    *   sum) ride the same sort. O(1) state per row. */
  def sessionIds(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, gapUs: Long): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("session_id",
        sum(when(col("__prev").isNull ||
            col(tsCol) - col("__prev") > gapUs, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      .drop("__prev")
  }
}
