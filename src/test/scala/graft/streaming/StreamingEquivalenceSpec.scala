package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** SURVEY §5.3-3: complete replay of events.parquet through each
  * Structured Streaming op equals its DuckDB-checked batch twin.
  * Replay uses Trigger.AvailableNow over the sf0.001 directory (one
  * file → one micro-batch, so update-mode sinks see each final row
  * exactly once).
  */
class StreamingEquivalenceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def replayCkpt(build: DataFrame => DataFrame, mode: String,
      name: String): (DataFrame, String) = {
    val ckpt = Files.createTempDirectory(s"ckpt-$name").toString
    val q = build(StreamOps.source(spark, sf)).writeStream
      .format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (spark.table(name), ckpt)
  }

  private def replay(build: DataFrame => DataFrame, mode: String, name: String): DataFrame =
    replayCkpt(build, mode, name)._1

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.mkString("|")).sorted

  test("T2 tumbling-hour replay equals batch twin") {
    val s = replay(StreamOps.tumblingHour, "complete", "t_tumbling")
    assert(rows(s) == rows(SparkEntry.queries("stream_tumbling_hour")(spark, sf)))
  }

  test("T3 sliding-window replay equals batch twin") {
    val s = replay(StreamOps.slidingQuarter, "complete", "t_sliding")
    assert(rows(s) == rows(SparkEntry.queries("stream_sliding")(spark, sf)))
  }

  test("T4 session-window replay equals batch twin") {
    val s = replay(StreamOps.sessionByUser, "complete", "t_session")
    assert(rows(s) == rows(SparkEntry.queries("stream_session")(spark, sf)))
  }

  test("T4 dynamic-gap session replay equals batch twin") {
    val s = replay(StreamOps.sessionByUserDynamic, "complete", "t_session_dyn")
    assert(rows(s) == rows(SparkEntry.queries("stream_session_dynamic")(spark, sf)))
  }

  test("skew-monitor replay equals batch twin") {
    val s = replay(StreamOps.skewMonitor(_), "complete", "t_skewmon")
    assert(rows(s) == rows(SparkEntry.queries("stream_skew_monitor")(spark, sf)))
  }

  test("T6 dedup-first replay: one event per user, all rows genuine") {
    // arrival order inside a multi-partition micro-batch is not pinned
    // (documented in StreamOps.dedupFirst), so assert the set contract:
    // exactly one emitted event per user, and each emitted row is a real
    // event of that user — the (ts, event_id)-deterministic form is the
    // batch twin, which the DuckDB oracle checks.
    val s = replay(StreamOps.dedupFirst, "append", "t_dedup")
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byUser = s.groupBy(_._1)
    val all = graft.Tables.events(spark, sf)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byUser.forall(_._2.length == 1), "exactly one event per user")
    assert(byUser.keySet == all.map(_._1), "every user present")
    assert(s.forall(all.contains), "every emitted row is a real event")
  }

  test("T7 forward-fill replay equals batch twin minus each user's tail hour") {
    val (s, ckpt) = replayCkpt(StreamOps.forwardFill(_).toDF(), "append", "t_ffill")
    val b = SparkEntry.queries("state_forward_fill")(spark, sf)
    val mh = b.groupBy("user_id").agg(max("h_us").as("mh"))
    val expected = b.join(mh, Seq("user_id")).filter(col("h_us") < col("mh"))
      .select("user_id", "h_us", "v_fill")
    assert(rows(s) == rows(expected))
    // and the tail hours are exactly one per user — nothing else missing
    assert(b.count() - s.count() == mh.count())
    // draining the pending bucket from the checkpointed state closes
    // the tail gap exactly: streamed ∪ flush == full batch scaffold
    val flushed = StateFlush.forwardFill(spark, ckpt).toDF()
    assert(rows(s.unionByName(flushed)) == rows(b.select("user_id", "h_us", "v_fill")))
  }

  test("T8 CEP sequence replay equals batch twin") {
    val s = replay(StreamOps.cepSequence, "append", "t_cep")
    assert(rows(s) == rows(SparkEntry.queries("cep_sequence")(spark, sf)))
  }

  test("T9 interval stream-stream join replay equals batch twin") {
    val s = replay(StreamOps.intervalJoin, "append", "t_ivjoin")
    assert(rows(s) == rows(SparkEntry.queries("stream_interval_join")(spark, sf)))
  }

  test("T8 N-step pattern (3 required steps) replay equals batch twin") {
    // inner-join matches are watermark-independent, so a complete
    // replay of the chained interval joins equals the batch funnel
    val s = replay(ev => CepOps.cepPattern(
        ev.withWatermark("ts", "1 hour"), "user_id", "ts", "event_id", Seq(
          PatternStep("a", col("event_type") === "click"),
          PatternStep("b", col("event_type") === "error", within = "360 minutes"),
          PatternStep("c", col("event_type") === "purchase", within = "360 minutes"))),
      "append", "t_cep_nstep")
    val batch = SparkEntry.queries("cep_funnel3")(spark, sf)
      .select("user_id", "a_id", "b_id", "c_id", "total_us")
    assert(rows(s) == rows(batch))
  }

  test("T8 absence replay: every verdict genuine, complete below the horizon") {
    val s = replay(ev => CepOps.cepAbsence(
        ev.withWatermark("ts", "1 hour"), "user_id", "ts", "event_id",
        first = col("event_type") === "click",
        absent = col("event_type") === "purchase",
        within = "360 minutes"),
      "append", "t_cep_absence")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = SparkEntry.queries("cep_absence")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // soundness: the stream never invents an absence
    assert(s.toSet.subsetOf(batch.toSet),
      s"stream emitted ${(s.toSet -- batch.toSet).size} phantom absences")
    // completeness below the horizon: the global watermark is the MIN
    // across the two filtered sides (see cepAbsence scaladoc), less the
    // 360-min band
    val ev = graft.Tables.events(spark, sf)
    def sideMax(t: String) = ev.filter(col("event_type") === t)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wm = math.min(sideMax("click"), sideMax("purchase")) - 3600L * 1000000
    val horizon = wm - 21600L * 1000000
    val due = batch.filter(_._3 < horizon).toSet
    assert(due.subsetOf(s.toSet),
      s"${(due -- s.toSet).size} overdue absence verdicts missing")
    assert(s.nonEmpty && due.nonEmpty, "fixture must exercise both sides")
  }

  test("T9-outer: null extension exact below the watermark horizon, match-only above") {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    val streamed = replay(StreamOps.intervalJoinOuter, "append", "t_ivjoin_outer")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))
    val ev = graft.Tables.events(spark, sf)
    val batch = {
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_uid"), col("ts").as("v_ts"),
          col("event_id").as("view_id"))
      c.join(v, col("user_id") === col("v_uid") &&
          col("v_ts") >= col("c_ts") - expr("INTERVAL 30 MINUTES") &&
          col("v_ts") <= col("c_ts"), "left_outer")
        .select(col("user_id"), col("click_id"), col("view_id"),
          unix_micros(col("c_ts")).as("c_ts_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))
    }
    // matched rows are watermark-independent: exact equality
    assert(streamed.filter(_._3 >= 0).sorted.toSeq ==
      batch.filter(_._3 >= 0).sorted.toSeq)
    // null-extended rows: every one the stream emitted is genuine…
    val streamedNulls = streamed.filter(_._3 < 0).map(t => (t._1, t._2)).toSet
    val batchNulls = batch.filter(_._3 < 0).map(t => (t._1, t._2)).toSet
    assert(streamedNulls.subsetOf(batchNulls))
    // …and below the final-watermark horizon none may be missing
    // the GLOBAL watermark is the min across both watermarked inputs —
    // the view side usually ends earlier than the click side, so the
    // horizon derives from min(max click ts, max view ts) − delay, less
    // the band and a batch of slack
    import org.apache.spark.sql.functions.max
    def sideMax(t: String) = ev.filter(col("event_type") === t)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val globalWm = math.min(sideMax("click"), sideMax("view")) - 3600L * 1000000
    val horizon = globalWm - 1800L * 1000000
    val dueNulls = batch.filter(t => t._3 < 0 && t._4 < horizon)
      .map(t => (t._1, t._2)).toSet
    assert(dueNulls.subsetOf(streamedNulls),
      s"${(dueNulls -- streamedNulls).size} overdue null-extensions missing")
  }

  test("T9-full-outer: matches exact, null extensions genuine on BOTH sides") {
    val s = replay(StreamOps.intervalJoinFull, "append", "t_ivj_full")
    val batch = SparkEntry.queries("stream_interval_join_full")(spark, sf)
    def key(df: DataFrame) = df.collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))
    }
    val (sm, bm) = (key(s), key(batch))
    // matched rows carry no watermark dependence: exact equality
    assert(sm.filter(t => t._2 >= 0 && t._3 >= 0).sorted.toSeq ==
      bm.filter(t => t._2 >= 0 && t._3 >= 0).sorted.toSeq)
    // every streamed null-extension (either side) is genuine
    assert(sm.filter(t => t._2 < 0 || t._3 < 0).toSet
      .subsetOf(bm.filter(t => t._2 < 0 || t._3 < 0).toSet))
    // both null directions exist in the batch truth (the shape is real)
    assert(bm.exists(_._2 < 0) && bm.exists(_._3 < 0))
  }

  test("CUMULATE-window replay equals batch twin") {
    val s = replay(StreamOps.cumulate(_), "complete", "t_cumulate")
    assert(rows(s) == rows(SparkEntry.queries("stream_cumulate")(spark, sf)))
    assert(s.count() > 0)
  }

  test("temporal-table-join replay equals batch twin") {
    val evB = graft.Tables.events(spark, sf).select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val dim = graft.operators.DiffOps.scd2(evB, keyCols = Seq("user_id"),
        orderCols = Seq("ts_us", "event_id"),
        attrCol = "event_type", tsCol = "ts_us")
      .select(col("user_id").as("d_uid"), col("event_type").as("state_then"),
        col("valid_from").as("valid_from_us"), col("valid_to").as("valid_to_us"))
    val s = replay(ev => StreamOps.temporalJoinStatic(
        ev.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us")),
        dim, "user_id", "d_uid", col("ts_us") - lit(3600000000L),
        "valid_from_us", "valid_to_us")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("state_then"), col("valid_from_us")),
      "append", "t_temporal")
    assert(rows(s) == rows(SparkEntry.queries("stream_temporal_join")(spark, sf)))
    assert(s.count() > 0)
  }
}
