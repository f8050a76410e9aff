package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key high-water mark: the largest event time this key has seen. */
case class KeyWmState(maxTsUs: Long)

/** Flink-style PER-KEY watermark emulation (SURVEY §2.9 T1 divergence).
  *
  * Spark's event-time watermark is a per-query global minimum: one slow
  * key holds the whole query's watermark back, and a fast key's
  * progress can get a slow key's still-fresh events dropped as late.
  * Flink tracks watermarks per partition/key group, so lateness is
  * judged against the key's own progress. This processor reproduces
  * that: each key keeps its own high-water mark in state, and an event
  * is late iff it lags ITS KEY's max event time by more than `delay` —
  * other keys never interfere.
  *
  * Within a micro-batch arrival order is pinned to (ts, event_id), so
  * in-batch reordering can't mark an event late; lateness manifests at
  * batch boundaries, mirroring Spark's own watermark advancement.
  *
  * @note scale: one long of state per key, one shuffle on the key —
  *   the same cost profile as any keyed stateful op; TTL the state if
  *   the keyspace churns. */
class PerKeyWatermarkProcessor(delayUs: Long)
    extends StatefulProcessor[Long, FillEvent, FillEvent] {

  @transient private var state: ValueState[KeyWmState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[KeyWmState](
      "key_wm", Encoders.product[KeyWmState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[FillEvent],
      timerValues: TimerValues): Iterator[FillEvent] = {
    val evs = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
    var maxTs = if (state.exists()) state.get().maxTsUs else Long.MinValue
    val out = scala.collection.mutable.ArrayBuffer.empty[FillEvent]
    evs.foreach { e =>
      if (maxTs == Long.MinValue || e.ts_us >= maxTs - delayUs) out += e
      if (e.ts_us > maxTs) maxTs = e.ts_us
    }
    state.update(KeyWmState(maxTs))
    out.iterator
  }
}

object PerKeyWatermark {
  /** Events that survive a per-key lateness filter with the given
    * bounded out-of-orderness; `ev` needs `user_id, ts, event_id,
    * value` columns. */
  def apply(ev: DataFrame, delayUs: Long = 10L * 60 * 1000000): Dataset[FillEvent] = {
    val sp = ev.sparkSession
    import sp.implicits._
    // Batch-mode transformWithState resolves the StateStoreCoordinator
    // RPC endpoint, which only the StreamingQueryManager registers —
    // touch it so a session that never ran a streaming query (fresh
    // JVM, batch-only caller) still finds the endpoint.
    sp.streams
    ev.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[FillEvent]
      .groupByKey(_.user_id)
      .transformWithState(new PerKeyWatermarkProcessor(delayUs),
        TimeMode.None(), OutputMode.Append())
  }
}
