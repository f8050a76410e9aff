package graft.streaming

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

case class CepEvent(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)

/** [[CepOps.cepPattern]] must subsume the fixed-shape CEP keys — the
  * 2-step `cep_sequence` and 3-step `cep_funnel3` are instances of the
  * general operator — and its optional-step semantics must decompose
  * into exactly (take branch = the required-3-step matches) ∪ (skip
  * branch = the direct 2-step matches). */
class CepOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("2 required steps reproduce cep_sequence exactly") {
    val pat = CepOps.cepPattern(Tables.events(spark, sf),
      "user_id", "ts", "event_id", Seq(
        PatternStep("a", col("event_type") === "error"),
        PatternStep("b", col("event_type") === "purchase", within = "10 minutes")))
    val ref = SparkEntry.queries("cep_sequence")(spark, sf)
      .select("user_id", "a_id", "b_id", "gap_us")
    assert(rows(pat) == rows(ref))
    assert(rows(pat).nonEmpty)
  }

  test("3 required steps reproduce cep_funnel3 exactly") {
    val pat = CepOps.cepPattern(Tables.events(spark, sf),
      "user_id", "ts", "event_id", Seq(
        PatternStep("a", col("event_type") === "click"),
        PatternStep("b", col("event_type") === "error", within = "360 minutes"),
        PatternStep("c", col("event_type") === "purchase", within = "360 minutes")))
    val ref = SparkEntry.queries("cep_funnel3")(spark, sf)
      .select("user_id", "a_id", "b_id", "c_id", "total_us")
    assert(rows(pat) == rows(ref))
    assert(rows(pat).nonEmpty)
  }

  test("optional middle = take branch ∪ skip branch, nothing else") {
    val ev = Tables.events(spark, sf)
    val withOpt = CepOps.cepPattern(ev, "user_id", "ts", "event_id", Seq(
      PatternStep("a", col("event_type") === "click"),
      PatternStep("b", col("event_type") === "error",
        within = "360 minutes", optional = true),
      PatternStep("c", col("event_type") === "purchase", within = "360 minutes")))
    val take = CepOps.cepPattern(ev, "user_id", "ts", "event_id", Seq(
      PatternStep("a", col("event_type") === "click"),
      PatternStep("b", col("event_type") === "error", within = "360 minutes"),
      PatternStep("c", col("event_type") === "purchase", within = "360 minutes")))
    val skip = CepOps.cepPattern(ev, "user_id", "ts", "event_id", Seq(
      PatternStep("a", col("event_type") === "click"),
      PatternStep("c", col("event_type") === "purchase", within = "360 minutes")))
    assert(rows(withOpt.filter(col("b_id").isNotNull)) == rows(take))
    assert(rows(withOpt.filter(col("b_id").isNull).drop("b_id")) == rows(skip))
    assert(rows(take).nonEmpty && rows(skip).nonEmpty)
  }

  test("streaming absence verdicts are watermark-gated and correct") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[CepEvent]
    val abs = CepOps.cepAbsence(
      input.toDF().withWatermark("ts", "10 minutes"),
      "user_id", "ts", "event_id",
      first = col("event_type") === "click",
      absent = col("event_type") === "purchase",
      within = "360 minutes")
    val q = abs.writeStream.format("memory").queryName("cep_abs_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-abs").toString)
      .start()
    try {
      input.addData(
        CepEvent(1L, t("10:00"), 100L, "click"),
        CepEvent(1L, t("12:00"), 101L, "purchase"), // inside band: NOT absent
        CepEvent(2L, t("10:00"), 200L, "click"))    // no purchase: absent
      q.processAllAvailable()
      // watermark (11:50) has not passed 16:00 yet — no verdicts
      assert(spark.table("cep_abs_stream").count() == 0)
      // each side's watermark advances only from rows passing ITS
      // predicate (filters push below the watermark exec), so both a
      // click and a purchase are needed to move the global min
      input.addData(CepEvent(9L, t("18:00"), 900L, "click"),
        CepEvent(9L, t("18:30"), 901L, "purchase")) // global wm -> 17:50
      q.processAllAvailable()
      input.addData(CepEvent(8L, t("19:00"), 800L, "click"),
        CepEvent(8L, t("19:05"), 801L, "purchase")) // flush emissions
      q.processAllAvailable()
      val out = spark.table("cep_abs_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == Set((2L, 200L)), s"got $out")
    } finally q.stop()
  }

  test("streaming 2-step pattern matches arrive incrementally") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[CepEvent]
    val pat = CepOps.cepPattern(
      input.toDF().withWatermark("ts", "10 minutes"),
      "user_id", "ts", "event_id", Seq(
        PatternStep("a", col("event_type") === "error"),
        PatternStep("b", col("event_type") === "purchase", within = "10 minutes")))
    val q = pat.writeStream.format("memory").queryName("cep_pat_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-cep").toString)
      .start()
    try {
      input.addData(
        CepEvent(1L, t("10:00"), 100L, "error"),
        CepEvent(1L, t("10:05"), 101L, "purchase"),  // match: 5 min gap
        CepEvent(1L, t("10:20"), 102L, "purchase"),  // no match: 20 min gap
        CepEvent(2L, t("10:00"), 200L, "purchase"))  // no match: no error
      q.processAllAvailable()
      input.addData(CepEvent(9L, t("13:00"), 900L, "view")) // advance watermark
      q.processAllAvailable()
      val out = spark.table("cep_pat_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(out == Set((1L, 100L, 101L, 300000000L)), s"got $out")
    } finally q.stop()
  }

  test("streaming alternation emits per-branch matches incrementally") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[CepEvent]
    val pat = CepOps.cepAlternation(
      input.toDF().withWatermark("ts", "10 minutes"),
      "user_id", "ts", "event_id", Seq(
        CepOps.AltStep("a", Seq("a" -> (col("event_type") === "click"))),
        CepOps.AltStep("mid", Seq(
          "error" -> (col("event_type") === "error"),
          "view" -> (col("event_type") === "view")), "60 minutes"),
        CepOps.AltStep("c", Seq("c" -> (col("event_type") === "purchase")),
          "60 minutes")))
    val q = pat.writeStream.format("memory").queryName("cep_alt_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt-alt").toString)
      .start()
    try {
      input.addData(
        CepEvent(1L, t("10:00"), 100L, "click"),
        CepEvent(1L, t("10:30"), 101L, "error"),
        CepEvent(1L, t("10:40"), 102L, "view"),
        CepEvent(1L, t("11:00"), 103L, "purchase"), // both branches match
        CepEvent(2L, t("10:00"), 200L, "click"),
        CepEvent(2L, t("10:30"), 201L, "view"),
        CepEvent(2L, t("10:50"), 202L, "purchase")) // view branch only
      q.processAllAvailable()
      input.addData(
        CepEvent(9L, t("20:00"), 900L, "click"),
        CepEvent(9L, t("20:01"), 901L, "error"),
        CepEvent(9L, t("20:02"), 902L, "view"),
        CepEvent(9L, t("20:03"), 903L, "purchase")) // advance watermark
      q.processAllAvailable()
      val out = spark.table("cep_alt_stream")
        .filter(col("user_id") < 9)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
        .toSet
      assert(out == Set((1L, 101L, "error"), (1L, 102L, "view"),
        (2L, 201L, "view")), s"got $out")
      // matches the batch run over the identical event set
      val batch = CepOps.cepAlternation(
        spark.table("cep_alt_stream").sparkSession
          .createDataFrame(Seq(
            CepEvent(1L, t("10:00"), 100L, "click"),
            CepEvent(1L, t("10:30"), 101L, "error"),
            CepEvent(1L, t("10:40"), 102L, "view"),
            CepEvent(1L, t("11:00"), 103L, "purchase"),
            CepEvent(2L, t("10:00"), 200L, "click"),
            CepEvent(2L, t("10:30"), 201L, "view"),
            CepEvent(2L, t("10:50"), 202L, "purchase"))),
        "user_id", "ts", "event_id", Seq(
          CepOps.AltStep("a", Seq("a" -> (col("event_type") === "click"))),
          CepOps.AltStep("mid", Seq(
            "error" -> (col("event_type") === "error"),
            "view" -> (col("event_type") === "view")), "60 minutes"),
          CepOps.AltStep("c",
            Seq("c" -> (col("event_type") === "purchase")), "60 minutes")))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
        .toSet
      assert(out == batch, s"stream $out != batch $batch")
    } finally q.stop()
  }

  test("streaming group Kleene emits one match per repetition count") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[CepEvent]
    // (click view)+ over the same keyed interval-join legs as batch —
    // each unrolled chain is watermark-bounded stream-stream joins,
    // the union preserves append mode
    val pat = CepOps.cepGroupKleene(
      input.toDF().withWatermark("ts", "10 minutes"),
      "user_id", "ts", "event_id",
      Seq("click" -> (col("event_type") === "click"),
        "view" -> (col("event_type") === "view")),
      maxReps = 2, within = "60 minutes")
    val q = pat.writeStream.format("memory").queryName("cep_grp_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt-grp").toString)
      .start()
    try {
      input.addData(
        CepEvent(1L, t("10:00"), 100L, "click"),
        CepEvent(1L, t("10:10"), 101L, "view"),
        CepEvent(1L, t("10:20"), 102L, "click"),
        CepEvent(1L, t("10:30"), 103L, "view"))
      q.processAllAvailable()
      input.addData(CepEvent(9L, t("20:00"), 900L, "view"))
      q.processAllAvailable()
      val out = spark.table("cep_grp_stream").filter(col("user_id") < 9)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
      // reps=1: (100,101) (100,103) (102,103); reps=2: the full chain
      assert(out == Set((100L, 101L, 1), (100L, 103L, 1),
        (102L, 103L, 1), (100L, 103L, 2)), s"got $out")
    } finally q.stop()
  }

  test("cepTimes: overlapping consecutive runs, within cutoff (fixture)") {
    val sp = spark
    import sp.implicits._
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")
    // user 1: view, then clicks 01:00, 02:00, 03:00, 20:00 — run (2,3,4)
    //   is strictly consecutive (span 2 h ok); (3,4,5) spans 18 h > cut.
    // user 2: click-view-click-click — the interleaved view BREAKS the
    //   run (Flink consecutive(): no other event of the key in between).
    // user 3: two clicks only — below n=3.
    val ev = Seq(
      CepEvent(1L, t("00:30"), 9L, "view"),
      CepEvent(1L, t("01:00"), 2L, "click"),
      CepEvent(1L, t("02:00"), 3L, "click"),
      CepEvent(1L, t("03:00"), 4L, "click"),
      CepEvent(1L, t("20:00"), 5L, "click"),
      CepEvent(2L, t("00:00"), 10L, "click"),
      CepEvent(2L, t("00:30"), 11L, "view"),
      CepEvent(2L, t("01:00"), 12L, "click"),
      CepEvent(2L, t("02:00"), 13L, "click"),
      CepEvent(3L, t("00:00"), 6L, "click"),
      CepEvent(3L, t("00:10"), 7L, "click")).toDF()
    val out = CepOps.cepTimes(ev, "user_id", "ts", "event_id",
        col("event_type") === "click", n = 3, within = "12 hours")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 2L, 4L, 7200000000L)), s"got $out")
  }

  test("cepTimes consecutive matches ⊆ relaxed times via identical-step cepPattern") {
    val ev = Tables.events(spark, sf)
    val cons = CepOps.cepTimes(ev, "user_id", "ts", "event_id",
        col("event_type") === "click", n = 3, within = "12 hours")
      .select("user_id", "first_id", "last_id")
    val relaxed = CepOps.cepPattern(ev, "user_id", "ts", "event_id", Seq(
        PatternStep("a", col("event_type") === "click"),
        PatternStep("b", col("event_type") === "click", within = "12 hours"),
        PatternStep("c", col("event_type") === "click", within = "12 hours")))
      .select(col("user_id"), col("a_id").as("first_id"), col("c_id").as("last_id"))
    assert(rows(cons).nonEmpty)
    assert(rows(cons).subsetOf(rows(relaxed)))
  }

  test("density guard: a 5+-slot chain past the cap fails loudly naming the within lever") {
    val ev = Tables.events(spark, sf)
    val slots = (1 to 5).map(i =>
      CepOps.AltStep(s"s$i", Seq(s"s$i" -> (col("event_type") === "click")),
        "12 hours"))
    // a tiny cap forces the refusal on the normal fixture; the message
    // must carry the guard's name and the lever
    val e = intercept[IllegalArgumentException] {
      CepOps.cepAlternation(ev, "user_id", "ts", "event_id", slots,
        maxChainEstimate = 1.0)
    }
    assert(e.getMessage.contains("density guard") &&
      e.getMessage.contains("within"),
      s"guard must name itself and the lever: ${e.getMessage}")
    // at the default cap the same chain builds and runs (1x density
    // estimates sit orders below it), and 4-slot chains never run the
    // pre-count at all (cap irrelevant even at 1.0)
    assert(CepOps.cepAlternation(ev, "user_id", "ts", "event_id", slots)
      .columns.contains("s5_id"))
    assert(CepOps.cepAlternation(ev, "user_id", "ts", "event_id",
        slots.take(4), maxChainEstimate = 1.0)
      .columns.contains("s4_id"))
  }
}
