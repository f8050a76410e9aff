package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** `transformWithState` ports of the two timer-gated window operators
  * ([[StreamOps.windowTopN]], [[StreamOps.cumulateAppend]]) — the
  * Spark-4 `StatefulProcessor` API the RocksDB provider is built
  * around. The behavioral contract is IDENTICAL to the fMGWS forms
  * (spec-pinned replay equality); what changes is the state SHAPE:
  *
  *  - fMGWS serializes each window's whole state object per update —
  *    a hot hour's count map is rewritten wholesale every batch;
  *  - here per-key counts / per-step partials live in a [[MapState]],
  *    so one arrival touches ONE RocksDB sub-key, updates stay O(new
  *    keys) per batch, and TTL ([[TTLConfig]]) can bound state without
  *    operator-side bookkeeping — the 100 TB state-lifecycle story.
  *
  * Timers: `registerTimer` replaces `setTimeoutTimestamp` (several may
  * be live per key); a fired timer whose target the watermark has not
  * actually reached re-arms instead of emitting, so clamped early
  * timers are harmless, exactly like the fMGWS straggler-window clamp.
  * Each processor tracks its one live timer in an `armed` [[ValueState]]
  * and re-registers ONLY when the clamped target moves (deleting the
  * superseded expiry) — without this, every micro-batch would park one
  * more no-op timer in RocksDB timer state until it fires.
  */
object WindowProcessors {

  private val HourUs = 3600L * 1000000L

  private val NoTimer = Long.MinValue

  /** [[StreamOps.windowTopN]] on transformWithState: key = window
    * start, MapState user→count, one-shot top-k emission at
    * `window end + delay` past the watermark. */
  class WindowTopNProcessor(k: Int, delayMs: Long)
      extends StatefulProcessor[Long, (Long, Long, java.sql.Timestamp), WinTopRow] {
    @transient private var counts: MapState[Long, Long] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[Long, Long](
        "counts", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def fireAtMs(ws: Long): Long = (ws + HourUs) / 1000L + delayMs

    /** Register at `target` only if it differs from the live timer;
      * the superseded expiry is deleted so timer state stays at one
      * entry per key instead of one per micro-batch. */
    private def arm(target: Long): Unit = {
      val prev = if (armed.exists()) armed.get() else NoTimer
      if (prev != target) {
        if (prev != NoTimer) getHandle.deleteTimer(prev)
        getHandle.registerTimer(target)
        armed.update(target)
      }
    }

    override def handleInputRows(ws: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[WinTopRow] = {
      rows.foreach { case (_, uid, _) =>
        val cur = if (counts.containsKey(uid)) counts.getValue(uid) else 0L
        counts.updateValue(uid, cur + 1L)
      }
      arm(math.max(fireAtMs(ws), timerValues.getCurrentWatermarkInMs() + 1L))
      Iterator.empty
    }

    override def handleExpiredTimer(ws: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[WinTopRow] = {
      if (armed.exists() && armed.get() == expiredTimerInfo.getExpiryTimeInMs())
        armed.clear() // the live timer just fired; nothing is pending now
      if (!counts.exists()) return Iterator.empty
      if (timerValues.getCurrentWatermarkInMs() < fireAtMs(ws)) {
        // clamped early timer: the real horizon is still ahead — re-arm
        arm(math.max(fireAtMs(ws), timerValues.getCurrentWatermarkInMs() + 1L))
        return Iterator.empty
      }
      val m = counts.iterator().map(p => (p._1, p._2)).toSeq
      counts.clear()
      m.sortBy { case (uid, n) => (-n, uid) }.take(k).zipWithIndex
        .map { case ((uid, n), i) => WinTopRow(ws, uid, n, i + 1) }.iterator
    }
  }

  /** [[StreamOps.windowTopN]] through transformWithState (requires the
    * RocksDB state store provider). */
  def windowTopNTws(ev: DataFrame, k: Int = 3,
      delayMs: Long = 10 * 60 * 1000L): Dataset[WinTopRow] = {
    val sp = ev.sparkSession
    import sp.implicits._
    ev.withWatermark("ts", "10 minutes")
      .select((unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(HourUs)))
        .as("ws_us"), col("user_id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new WindowTopNProcessor(k, delayMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[StreamOps.cumulateAppend]] on transformWithState: key = window
    * start, MapState stepEnd→(n, sum×10⁶), ValueState high-water mark
    * of emitted ends; due ends emit from BOTH the data path and the
    * timer path, exactly like the fMGWS form. */
  class CumulateProcessor(sizeUs: Long, stepUs: Long)
      extends StatefulProcessor[Long, (Long, Long, java.sql.Timestamp), CumRow] {
    @transient private var steps: MapState[Long, (Long, Long)] = _
    @transient private var emitted: ValueState[Long] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      steps = getHandle.getMapState[Long, (Long, Long)]("steps",
        Encoders.scalaLong, Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      emitted = getHandle.getValueState[Long]("emitted",
        Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** See [[WindowTopNProcessor.arm]]: one live timer per key. */
    private def arm(target: Long): Unit = {
      val prev = if (armed.exists()) armed.get() else NoTimer
      if (prev != target) {
        if (prev != NoTimer) getHandle.deleteTimer(prev)
        getHandle.registerTimer(target)
        armed.update(target)
      }
    }

    /** Emit every grid end the watermark has passed; returns rows and
      * re-arms or clears state. Shared by both paths. */
    private def emitDue(ws: Long, tv: TimerValues): Iterator[CumRow] = {
      if (!steps.exists()) return Iterator.empty
      val weLast = ws + sizeUs
      val all = steps.iterator().map(p => (p._1, p._2)).toSeq
      val emittedUpTo = if (emitted.exists()) emitted.get() else Long.MinValue
      val wmUs = tv.getCurrentWatermarkInMs() * 1000L
      val first = all.iterator.map(_._1).min
      val start = math.max(first, emittedUpTo + stepUs)
      val due = Iterator.iterate(start)(_ + stepUs)
        .takeWhile(we => we <= wmUs && we <= weLast).toList
      val rows = due.map { we =>
        val (n, s6) = all.iterator.filter(_._1 <= we)
          .foldLeft((0L, 0L)) { case ((a, b), (_, (n2, s2))) => (a + n2, b + s2) }
        CumRow(ws, we, n,
          BigDecimal(s6, 6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val upTo = if (due.nonEmpty) due.last else emittedUpTo
      if (upTo >= weLast) {
        steps.clear(); emitted.clear()
        if (armed.exists()) { getHandle.deleteTimer(armed.get()); armed.clear() }
      } else {
        emitted.update(upTo)
        val next = math.max(if (upTo == Long.MinValue) first else upTo + stepUs, first)
        arm(math.max(next / 1000L, tv.getCurrentWatermarkInMs() + 1L))
      }
      rows.iterator
    }

    override def handleInputRows(ws: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[CumRow] = {
      rows.foreach { case (tsUs, v6, _) =>
        val we = tsUs - Math.floorMod(tsUs, stepUs) + stepUs
        val (n0, s0) = steps.getValue(we) match {
          case null => (0L, 0L)
          case t => t
        }
        steps.updateValue(we, (n0 + 1L, s0 + v6))
      }
      emitDue(ws, timerValues)
    }

    override def handleExpiredTimer(ws: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[CumRow] = {
      if (armed.exists() && armed.get() == expiredTimerInfo.getExpiryTimeInMs())
        armed.clear() // the live timer just fired; nothing is pending now
      emitDue(ws, timerValues)
    }
  }

  /** [[StreamOps.overRows]] on transformWithState: pending rows live in
    * a [[org.apache.spark.sql.streaming.ListState]] (appends touch only
    * the new rows — the fMGWS form rewrites the whole buffer object per
    * batch), the ≤nPrec frame context in a ValueState, and an event-time
    * timer at the earliest pending row closes the fMGWS form's gap:
    * rows whose watermark slot arrives while their key sees no new
    * input emit from the timer instead of waiting for the drain. */
  class OverRowsProcessor(nPrec: Int)
      extends StatefulProcessor[Long, (Long, Long, Long, Long, java.sql.Timestamp), OverRow] {
    @transient private var ctx: ValueState[OverCtx] = _
    @transient private var pending: org.apache.spark.sql.streaming.ListState[OverPend] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ctx = getHandle.getValueState[OverCtx]("ctx",
        Encoders.product[OverCtx], TTLConfig.NONE)
      pending = getHandle.getListState[OverPend]("pending",
        Encoders.product[OverPend], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def arm(target: Long): Unit = {
      val prev = if (armed.exists()) armed.get() else NoTimer
      if (prev != target) {
        if (prev != NoTimer) getHandle.deleteTimer(prev)
        getHandle.registerTimer(target)
        armed.update(target)
      }
    }

    /** Emit every buffered row at or below the watermark in (ts, id)
      * order, keep the rest, re-arm for the earliest survivor. */
    private def drain(uid: Long, fresh: Seq[OverPend],
        tv: TimerValues): Iterator[OverRow] = {
      val wmUs = tv.getCurrentWatermarkInMs() * 1000L
      val all = (pending.get().toSeq ++ fresh.filter(_.ts_us > wmUs))
        .sortBy(p => (p.ts_us, p.event_id))
      val (ready, keep) = all.partition(_.ts_us <= wmUs)
      var frame = if (ctx.exists()) ctx.get().vals else Seq.empty[Long]
      val out = ready.map { p =>
        val f = frame :+ p.c4
        frame = f.takeRight(nPrec)
        OverRow(uid, p.event_id, f.size, BigDecimal(f.sum, 4).toDouble)
      }
      if (ready.nonEmpty) ctx.update(OverCtx(frame))
      pending.clear()
      if (keep.nonEmpty) {
        pending.put(keep.toArray)
        arm(math.max(keep.head.ts_us / 1000L + 1L,
          tv.getCurrentWatermarkInMs() + 1L))
      }
      out.iterator
    }

    override def handleInputRows(uid: Long,
        rows: Iterator[(Long, Long, Long, Long, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[OverRow] =
      drain(uid, rows.map(t => OverPend(t._2, t._3, t._4)).toSeq, timerValues)

    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[OverRow] = {
      if (armed.exists() && armed.get() == expiredTimerInfo.getExpiryTimeInMs())
        armed.clear()
      drain(uid, Nil, timerValues)
    }
  }

  /** [[StreamOps.overRows]] through transformWithState (requires the
    * RocksDB state store provider): same emission contract, ListState
    * buffer, timer-complete (no drain gap below the final watermark). */
  def overRowsTws(ev: DataFrame, nPrec: Int = 3,
      delay: String = "30 minutes"): Dataset[OverRow] = {
    val sp = ev.sparkSession
    import sp.implicits._
    ev.withWatermark("ts", delay)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)) *
          lit(10000L)).cast("long").as("c4"), col("ts"))
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new OverRowsProcessor(nPrec),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[StreamOps.cumulateAppend]] through transformWithState (requires
    * the RocksDB state store provider). */
  def cumulateAppendTws(ev: DataFrame, sizeHours: Int = 4,
      stepMinutes: Int = 60, delay: String = "10 minutes"): Dataset[CumRow] = {
    val sp = ev.sparkSession
    import sp.implicits._
    val sizeUs = sizeHours * 3600L * 1000000L
    val stepUs = stepMinutes * 60L * 1000000L
    ev.withWatermark("ts", delay)
      .select(unix_micros(col("ts")).as("ts_us"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)) *
          lit(1000000L)).cast("long").as("v6"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(t => t._1 - Math.floorMod(t._1, sizeUs))
      .transformWithState(new CumulateProcessor(sizeUs, stepUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
