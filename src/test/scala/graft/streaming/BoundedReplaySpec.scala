package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** [[BoundedReplay]] — the end-to-end replay harness behind the
  * `stream_cumulate_append` / `stream_topn_replay` /
  * `stream_ffill_replay` t2 keys. The DuckDB oracle already pins
  * streamed ∪ flushed == batch twin; what these tests pin is that the
  * harness genuinely exercises the streaming machinery — multiple
  * micro-batches with real watermark advancement, so SOME emissions
  * happen through event-time timers during the replay (not everything
  * collapsing into the end-of-replay state drain, which would make the
  * keys a disguised batch path).
  */
class BoundedReplaySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("chunked replay emits through timers before the flush drains the tail") {
    var flushed: Long = -1L
    val combined = BoundedReplay.replayEvents(spark, sf)(
        ev => StreamOps.cumulateAppend(ev))(
        ckpt => {
          val f = StateFlush.cumulateAppend(spark, ckpt)
          flushed = f.count()
          f
        })
    val total = combined.count()
    assert(flushed >= 0, "flush ran")
    assert(total > flushed,
      "some sub-window ends must emit DURING the replay (watermark " +
        "advanced across micro-batches) — all-flushed means the replay " +
        "degenerated to a single batch")
    assert(flushed > 0,
      "the tail past the final watermark must drain via the state source")
  }

  test("replay keys equal their batch twins row-for-row") {
    def rows(k: String) = SparkEntry.queries(k)(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(rows("stream_cumulate_append") == rows("stream_cumulate"))
    assert(rows("stream_topn_replay") == rows("stream_window_topn"))
    assert(rows("stream_ffill_replay") == rows("state_forward_fill"))
  }

  test("chunk split covers every event exactly once in time order") {
    // the bucket expression is internal; pin its contract through the
    // result instead: a 1-chunk replay (single batch, everything
    // flushed) still equals the batch twin
    val one = BoundedReplay.replayEvents(spark, sf, chunks = 1)(
        ev => StreamOps.cumulateAppend(ev))(
        ckpt => StateFlush.cumulateAppend(spark, ckpt))
      .orderBy("ws_us", "we_us").collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("stream_cumulate")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(one == batch)
  }
}
