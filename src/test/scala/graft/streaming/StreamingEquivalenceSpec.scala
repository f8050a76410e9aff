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

  private def replay(build: DataFrame => DataFrame, mode: String, name: String): DataFrame = {
    val ckpt = Files.createTempDirectory(s"ckpt-$name").toString
    val q = build(StreamOps.source(spark, sf)).writeStream
      .format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

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
    val s = replay(StreamOps.forwardFill(_).toDF(), "append", "t_ffill")
    val b = SparkEntry.queries("state_forward_fill")(spark, sf)
    val mh = b.groupBy("user_id").agg(max("h_us").as("mh"))
    val expected = b.join(mh, Seq("user_id")).filter(col("h_us") < col("mh"))
      .select("user_id", "h_us", "v_fill")
    assert(rows(s) == rows(expected))
    // and the tail hours are exactly one per user — nothing else missing
    assert(b.count() - s.count() == mh.count())
  }

  test("T8 CEP sequence replay equals batch twin") {
    val s = replay(StreamOps.cepSequence, "append", "t_cep")
    assert(rows(s) == rows(SparkEntry.queries("cep_sequence")(spark, sf)))
  }

  test("T9 interval stream-stream join replay equals batch twin") {
    val s = replay(StreamOps.intervalJoin, "append", "t_ivjoin")
    assert(rows(s) == rows(SparkEntry.queries("stream_interval_join")(spark, sf)))
  }
}
