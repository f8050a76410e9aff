package graft.streaming

import org.apache.spark.sql.{Encoders, Dataset, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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
