package graft.streaming

import org.apache.spark.sql.{Encoders, Dataset, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark-4-native variant of the forward-fill pattern (SURVEY §1.2:
  * `transformWithState` / `StatefulProcessor` — the successor API to
  * `flatMapGroupsWithState`, requires the RocksDB state store provider).
  * Semantics are identical to [[StreamOps.forwardFill]]; the equivalence
  * spec asserts byte-identical output under full replay.
  *
  * @note scale: state is a single `ValueState[FillState]` per user —
  *   O(1), TTL-able via [[TTLConfig]]; RocksDB keeps it off-heap, so
  *   keyspace size is bounded by disk, not executor memory.
  */
class ForwardFillProcessor extends StatefulProcessor[Long, FillEvent, FillRow] {

  private val HourUs = 3600L * 1000000L
  @transient private var state: ValueState[FillState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[FillState](
      "fill", Encoders.product[FillState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[FillEvent],
      timerValues: TimerValues): Iterator[FillRow] = {
    val evs = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
    var st: FillState = if (state.exists()) state.get() else null
    val out = scala.collection.mutable.ArrayBuffer.empty[FillRow]
    evs.foreach { e =>
      val h = Math.floorDiv(e.ts_us, HourUs) * HourUs
      if (st == null) st = FillState(h, e.ts_us, e.event_id, e.value)
      else if (h > st.curHourUs) {
        var hh = st.curHourUs
        while (hh < h) { out += FillRow(key, hh, st.curValue); hh += HourUs }
        st = FillState(h, e.ts_us, e.event_id, e.value)
      } else if (e.ts_us > st.curTsUs ||
        (e.ts_us == st.curTsUs && e.event_id > st.curEventId)) {
        st = FillState(st.curHourUs, e.ts_us, e.event_id, e.value)
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }
}

object ForwardFillTws {
  /** [[StreamOps.forwardFill]] through the transformWithState API. */
  def apply(ev: DataFrame): Dataset[FillRow] = {
    val sp = ev.sparkSession
    import sp.implicits._
    ev.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[FillEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ForwardFillProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}

/** [[ForwardFillProcessor]] state plus a flushed-through marker so the
  * event path and the timer path never double-emit a bucket. */
case class TimerFillState(curHourUs: Long, curTsUs: Long, curEventId: Long,
  curValue: Double, flushedHourUs: Long)

/** Forward-fill with an event-time TAIL FLUSH — the Flink
  * `registerEventTimeTimer` form of the pattern. The event path is
  * [[ForwardFillProcessor]]'s (a bucket is emitted when a later bucket
  * opens); in addition every input row (re)arms a timer at the current
  * hour's end, and when the watermark passes it, [[handleExpiredTimer]]
  * emits the still-open bucket instead of leaving it parked in state
  * forever. A key that goes quiet therefore flushes its final partial
  * hour as soon as the rest of the stream drags the global watermark
  * past it — the one divergence left vs the batch twin is the bucket(s)
  * whose hour-end the final watermark never reaches.
  *
  * Stale timers (the key's hour advanced before expiry) no-op via the
  * flushed-through marker; gap-filling on the event path starts at the
  * first unflushed hour for the same reason.
  *
  * @note scale: still O(1) state per key plus at most one productive
  *   timer per key per hour; timers live in the state store (RocksDB),
  *   not executor memory. */
class ForwardFillTimerProcessor extends StatefulProcessor[Long, FillEvent, FillRow] {

  private val HourUs = 3600L * 1000000L
  @transient private var state: ValueState[TimerFillState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[TimerFillState](
      "fill_timer", Encoders.product[TimerFillState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[FillEvent],
      timerValues: TimerValues): Iterator[FillRow] = {
    val evs = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
    var st: TimerFillState = if (state.exists()) state.get() else null
    val out = scala.collection.mutable.ArrayBuffer.empty[FillRow]
    evs.foreach { e =>
      val h = Math.floorDiv(e.ts_us, HourUs) * HourUs
      if (st == null) st = TimerFillState(h, e.ts_us, e.event_id, e.value, Long.MinValue)
      else if (h > st.curHourUs) {
        // fill from the first hour neither path has emitted yet
        var hh = math.max(st.curHourUs, st.flushedHourUs + HourUs)
        while (hh < h) { out += FillRow(key, hh, st.curValue); hh += HourUs }
        st = TimerFillState(h, e.ts_us, e.event_id, e.value, st.flushedHourUs)
      } else if (e.ts_us > st.curTsUs ||
        (e.ts_us == st.curTsUs && e.event_id > st.curEventId)) {
        st = TimerFillState(st.curHourUs, e.ts_us, e.event_id, e.value, st.flushedHourUs)
      }
    }
    if (st != null) {
      state.update(st)
      getHandle.registerTimer((st.curHourUs + HourUs) / 1000L) // hour end, ms
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[FillRow] = {
    if (!state.exists()) return Iterator.empty
    val st = state.get()
    val hourEndMs = (st.curHourUs + HourUs) / 1000L
    // only the timer armed for the CURRENT hour flushes; earlier-armed
    // timers whose hour already closed via the event path are stale
    if (expiredTimerInfo.getExpiryTimeInMs >= hourEndMs &&
        st.curHourUs > st.flushedHourUs) {
      state.update(st.copy(flushedHourUs = st.curHourUs))
      Iterator.single(FillRow(key, st.curHourUs, st.curValue))
    } else Iterator.empty
  }
}

object ForwardFillTimerTws {
  /** Timer-flushing forward-fill; requires an event-time watermark on
    * `ev`'s `ts` (the caller's delay choice) for TimeMode.EventTime. */
  def apply(ev: DataFrame, delay: String = "10 minutes"): Dataset[FillRow] = {
    val sp = ev.sparkSession
    import sp.implicits._
    ev.withWatermark("ts", delay)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[FillEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ForwardFillTimerProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
