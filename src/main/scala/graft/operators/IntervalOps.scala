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

  /** Gap-AND-duration sessionization: a session breaks when the gap
    * from the previous event exceeds `gapUs` OR when the event would
    * stretch the session past `capUs` from its first event (Flink
    * users build exactly this cap with a ProcessFunction on top of
    * session windows — billing sessions, bounded-replay sessions).
    * The cap makes the assignment a CHAIN (each break point depends on
    * the session's start, which depends on earlier breaks), so unlike
    * [[sessionIds]] no window frame expresses it: events fold per key
    * in time order with O(1) carried state. Returns
    * `(key, id, session_id)` with sessions numbered 1..k per key.
    *
    * @note scale: one shuffle (groupByKey); the fold buffers one KEY's
    *   events for the in-memory sort — same bound as any per-key
    *   sessionization; for keys too hot for that, pre-split by day and
    *   stitch boundary sessions.
    *
    * All three columns must cast cleanly to long — a NULL after the
    * cast (non-numeric device id, session token, missing timestamp)
    * raises at execution instead of silently collapsing every row into
    * one NULL-keyed group with wrong session ids. Hash or dictionary-
    * encode non-numeric keys first. */
  def sessionIdsCapped(df: DataFrame, keyCol: String, tsUsCol: String,
      idCol: String, gapUs: Long, capUs: Long): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    def longStrict(name: String): Column =
      when(col(name).cast("long").isNull,
        raise_error(concat(lit(s"sessionIdsCapped: column '$name' value '"),
          col(name).cast("string"),
          lit("' does not cast to long — hash/encode non-numeric columns first"))))
        .otherwise(col(name).cast("long"))
    df.select(longStrict(keyCol), longStrict(tsUsCol), longStrict(idCol))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        var sid = 0
        var sessionStart = Long.MinValue
        var prevTs = Long.MinValue
        it.toArray.sortBy(e => (e._2, e._3)).iterator.map { case (_, ts, id) =>
          if (sid == 0 || ts - prevTs > gapUs || ts - sessionStart > capUs) {
            sid += 1
            sessionStart = ts
          }
          prevTs = ts
          (k, id, sid)
        }
      }
      .toDF(keyCol, idCol, "session_id")
  }

  /** Time-series GAP FILLING: hourly aggregate per group with EMPTY
    * buckets materialized (n=0, sum=0) over the corpus's [min, max]
    * hour grid — dashboards and window-over-window arithmetic need the
    * zero rows that a plain GROUP BY drops. The grid is generated, not
    * stored: one global (min, max) row expands via `sequence()` and
    * cross-joins the distinct group values, then the real aggregate
    * left-joins on. Returns `(ws, <groupCol>, n, sum_value)`.
    *
    * @note scale: the aggregate is the usual hash agg; the grid side is
    *   #hours × #groups rows built from a one-row bound — broadcast it
    *   and the fill join is shuffle-free on the agg side. A year of
    *   hours × 10⁴ groups is ~10⁸ grid rows — still far below the
    *   event count that made the aggregate worth running; for sparser
    *   grids switch the grain or bound per group. */
  def gapFillHourly(df: DataFrame, tsCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val agg = df
      .groupBy(date_trunc("hour", col(tsCol)).as("ws"), col(groupCol))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col(valueCol)).as("sum_value"))
    val bounds = df.agg(
      date_trunc("hour", min(col(tsCol))).as("lo"),
      date_trunc("hour", max(col(tsCol))).as("hi"))
    val grid = bounds
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("ws"))
      .crossJoin(df.select(col(groupCol)).distinct())
    grid.join(agg, Seq("ws", groupCol), "left")
      .select(col("ws"), col(groupCol),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }
}
