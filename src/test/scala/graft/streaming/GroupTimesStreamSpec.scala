package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Parity pins for the MULTIPLEXED streaming group quantifier
  * ([[StreamOps.cepGroupTimesStream]]): the r14 join-form replay was
  * adjudicated out at 15–56 s per key (two state stores per unrolled
  * slot per micro-batch); this automaton holds ONE state row per key.
  * The gate: replay through real micro-batches must equal the batch
  * [[CepOps.cepGroupTimes]] EXACTLY — same all-paths emission, same
  * strict-increase/within bands, no flush gap. */
class GroupTimesStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  // value-split members (the cep_group_mixed fixture shape): every
  // event matches one of the two, so sf0.001 still has real match mass
  private val grp = Seq("hi" -> (col("value") >= 50),
    "lo" -> (col("value") < 50))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.mkString("|")).toSet

  private def emptyLike(schema: org.apache.spark.sql.types.StructType) =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  test("replay through real micro-batches == batch cepGroupTimes, all paths") {
    val ev0 = Tables.events(spark, sf).filter(col("user_id") < 30)
    val batch = CepOps.cepGroupTimes(ev0,
      "user_id", "ts", "event_id", grp, n = 2, within = "360 minutes")
    val streamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.cepGroupTimesStream(ev.filter(col("user_id") < 30),
        "user_id", "ts", "event_id",
        grp, n = 2, withinUs = 360L * 60L * 1000000L))(
      _ => emptyLike(batch.schema))
    assert(streamed.columns.toSeq == batch.columns.toSeq,
      "streaming output must carry the batch column shape")
    val s = rows(streamed)
    val b = rows(batch)
    assert(s == b,
      s"streamed != batch: extra=${(s -- b).take(3)} missing=${(b -- s).take(3)}")
    assert(b.nonEmpty, "fixture must contain (hi lo){2} matches")
  }

  test("3-member group with OVERLAPPING predicates and n=1 replays to batch parity") {
    // "any" overlaps both value splits — one event can satisfy several
    // members (multi-bit mask), the case a per-member class column
    // cannot express
    val grp3 = Seq("hi" -> (col("value") >= 50),
      "lo" -> (col("value") < 50), "any" -> (col("value") >= 0))
    val ev0 = Tables.events(spark, sf).filter(col("user_id") < 10)
    val batch = CepOps.cepGroupTimes(ev0,
      "user_id", "ts", "event_id", grp3, n = 1, within = "60 minutes")
    val streamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.cepGroupTimesStream(ev.filter(col("user_id") < 10),
        "user_id", "ts", "event_id",
        grp3, n = 1, withinUs = 60L * 60L * 1000000L))(
      _ => emptyLike(batch.schema))
    assert(rows(streamed) == rows(batch))
    assert(rows(batch).nonEmpty, "fixture must contain hi lo any chains")
  }

  test("MIXED shape A (B C){n} D replays to batch parity") {
    val pre = Seq("signup" -> (col("event_type") === "signup"))
    val post = Seq("purchase" -> (col("event_type") === "purchase"))
    val ev0 = Tables.events(spark, sf).filter(col("user_id") < 30)
    val batch = CepOps.cepGroupTimesMixed(ev0, "user_id", "ts",
      "event_id", pre, grp, n = 2, post, within = "1440 minutes")
    val streamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.cepGroupTimesMixedStream(ev.filter(col("user_id") < 30),
        "user_id", "ts", "event_id", pre, grp, n = 2, post,
        withinUs = 1440L * 60L * 1000000L))(
      _ => emptyLike(batch.schema))
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    assert(rows(streamed) == rows(batch))
    assert(rows(batch).nonEmpty, "fixture must contain mixed matches")
  }

  test("group KLEENE (A B)+ replays to batch per-count-union parity") {
    // the boundary-emission automaton vs the batch THREE-CHAIN union:
    // a 3-rep run must report its 1- and 2-rep prefixes from ONE
    // partial exactly as the union reports them from three chains
    val grp2 = Seq("click" -> (col("event_type") === "click"),
      "view" -> (col("event_type") === "view"))
    // 1440-min band: the smallest where sf0.001 holds a full 3-rep
    // run (360 min tops out at reps=1)
    val batch = CepOps.cepGroupKleene(Tables.events(spark, sf),
      "user_id", "ts", "event_id", grp2, maxReps = 3,
      within = "1440 minutes")
    val sp = spark
    import sp.implicits._
    val streamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.cepGroupKleeneStream(ev, "user_id", "ts", "event_id",
        grp2, maxReps = 3, withinUs = 1440L * 60L * 1000000L))(
      _ => sp.emptyDataset[GKMatch])
    assert(streamed.columns.toSeq == batch.columns.toSeq,
      "streaming output must carry the batch column shape")
    val s = rows(streamed)
    val b = rows(batch)
    assert(s == b,
      s"streamed != batch: extra=${(s -- b).take(3)} missing=${(b -- s).take(3)}")
    assert(b.exists(_.split('|')(3) == "3"),
      "fixture must contain a full 3-rep run (prefix emission exercised)")
  }

  test("group RANGE (A B){n,m} replays to batch per-count-union parity") {
    // boundary emission on the times range: one g·m slot chain, a
    // partial emits at every completed g·r boundary for r in n..m —
    // must equal the batch m−n+1-chain UNION exactly, including the
    // null-padded m-shape and the reps column
    val grp2 = Seq("click" -> (col("event_type") === "click"),
      "view" -> (col("event_type") === "view"))
    val batch = CepOps.cepGroupRange(Tables.events(spark, sf),
      "user_id", "ts", "event_id", grp2, n = 1, m = 2,
      within = "1440 minutes")
    val streamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.cepGroupRangeStream(ev, "user_id", "ts", "event_id",
        grp2, n = 1, m = 2, withinUs = 1440L * 60L * 1000000L))(
      _ => emptyLike(batch.schema))
    assert(streamed.columns.toSeq == batch.columns.toSeq,
      "streaming output must carry the batch column shape")
    val s = rows(streamed)
    val b = rows(batch)
    assert(s == b,
      s"streamed != batch: extra=${(s -- b).take(3)} missing=${(b -- s).take(3)}")
    assert(b.exists(_.split('|')(5) == "2"),
      "fixture must contain a full 2-rep run (boundary emission exercised)")
    assert(b.exists(_.split('|')(5) == "1"),
      "fixture must contain 1-rep matches (null-padded shape exercised)")
  }

  test("CLOSED range (A B){n,m}? D: streamed ∪ flush == batch per-anchor argmin") {
    // the buffering/resolution automaton: completions wait until their
    // anchor's last live partial dies (or end-of-replay state flush),
    // then the minimal count's rows emit — must equal the batch
    // argmin union EXACTLY, including anchors that resolve only in the
    // flush (open horizon at end of data)
    val grp2 = Seq("click" -> (col("event_type") === "click"),
      "view" -> (col("event_type") === "view"))
    val post = Seq("signup" -> (col("event_type") === "signup"))
    val batch = CepOps.cepGroupRangeReluctant(Tables.events(spark, sf),
      "user_id", "ts", "event_id", grp2, n = 1, m = 2,
      within = "1440 minutes", post = post)
    val streamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.cepGroupRangeReluctantStream(ev, "user_id", "ts",
        "event_id", grp2, n = 1, m = 2,
        withinUs = 1440L * 60L * 1000000L, post = post))(
      ckpt => StateFlush.groupRangeClosed(spark, ckpt, "user_id", grp2,
        m = 2, post = post, greedy = false))
    assert(streamed.columns.toSeq == batch.columns.toSeq,
      "streaming output must carry the batch column shape")
    val s = rows(streamed)
    val b = rows(batch)
    assert(s == b,
      s"streamed != batch: extra=${(s -- b).take(3)} missing=${(b -- s).take(3)}")
    assert(b.nonEmpty, "fixture must contain reluctant-range matches")
    // the GREEDY mirror on the same fixture picks differently
    val gbatch = CepOps.cepGroupRangeGreedy(Tables.events(spark, sf),
      "user_id", "ts", "event_id", grp2, n = 1, m = 2,
      within = "1440 minutes", post = post)
    val gstreamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.cepGroupRangeGreedyStream(ev, "user_id", "ts",
        "event_id", grp2, n = 1, m = 2,
        withinUs = 1440L * 60L * 1000000L, post = post))(
      ckpt => StateFlush.groupRangeClosed(spark, ckpt, "user_id", grp2,
        m = 2, post = post, greedy = true))
    assert(rows(gstreamed) == rows(gbatch),
      "greedy streamed != greedy batch")
    // PRE steps: the flat pre chain precedes the repeated group and
    // the anchor moves to the match start (gids(0) either way)
    val pre = Seq("signup" -> (col("event_type") === "signup"))
    val post2 = Seq("purchase" -> (col("event_type") === "purchase"))
    val pbatch = CepOps.cepGroupRangeReluctant(Tables.events(spark, sf),
      "user_id", "ts", "event_id", grp2, n = 1, m = 2,
      within = "1440 minutes", post = post2, pre = pre)
    val pstreamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.cepGroupRangeReluctantStream(ev, "user_id", "ts",
        "event_id", grp2, n = 1, m = 2,
        withinUs = 1440L * 60L * 1000000L, post = post2, pre = pre))(
      ckpt => StateFlush.groupRangeClosed(spark, ckpt, "user_id", grp2,
        m = 2, post = post2, greedy = false, pre = pre))
    assert(pstreamed.columns.toSeq == pbatch.columns.toSeq)
    assert(rows(pstreamed) == rows(pbatch), "pre-step streamed != batch")
  }

  test("maxPartials fails loudly instead of growing state silently") {
    val e = intercept[Exception] {
      BoundedReplay.replayEvents(spark, sf)(ev =>
        StreamOps.cepGroupTimesStream(ev, "user_id", "ts", "event_id",
          grp, n = 2, withinUs = 360L * 60L * 1000000L, maxPartials = 1))(
        _ => spark.emptyDataFrame).count()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("maxPartials"))),
      s"expected the maxPartials loud fail, got: ${e.getMessage}")
  }
}
