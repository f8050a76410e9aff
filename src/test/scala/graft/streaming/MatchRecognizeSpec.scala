package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The MATCH_RECOGNIZE string face compiles each supported PATTERN
  * shape to the same rows as the direct operator call. */
class MatchRecognizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def ev = Tables.events(spark, sf)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.mkString("|")).sorted

  test("PATTERN (A B+ C) compiles to cepKleene") {
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN (A B+ C)
        |DEFINE A AS event_type = 'view',
        |       B AS event_type = 'click',
        |       C AS event_type = 'purchase'
        |WITHIN INTERVAL '360' MINUTE""".stripMargin)
    val direct = CepOps.cepKleene(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", "360 MINUTE")
    assert(rows(mr) == rows(direct) && mr.count() > 0)
  }

  test("PATTERN (A B? C) compiles to cepPattern with a whole-match bound") {
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN (A B? C)
        |DEFINE A AS event_type = 'click',
        |       B AS event_type = 'error',
        |       C AS event_type = 'purchase'
        |WITHIN 360 minutes""".stripMargin)
    val direct = CepOps.cepPattern(ev, "user_id", "ts", "event_id", Seq(
        PatternStep("A", col("event_type") === "click"),
        PatternStep("B", col("event_type") === "error", "360 minutes", optional = true),
        PatternStep("C", col("event_type") === "purchase", "360 minutes")))
      .filter(col("total_us") <= 360L * 60 * 1000000)
    assert(rows(mr) == rows(direct) && mr.count() > 0)
  }

  test("PATTERN (A{3}) compiles to cepTimes") {
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN (A{3}) DEFINE A AS event_type = 'click'
        |WITHIN INTERVAL '12' HOUR""".stripMargin)
    val direct = CepOps.cepTimes(ev, "user_id", "ts", "event_id",
      col("event_type") === "click", 3, "12 HOUR")
    assert(rows(mr) == rows(direct))
  }

  test("AFTER MATCH SKIP routes 2-step sequences to the strategy operators") {
    val toNext = MatchRecognize(ev, "user_id", "ts", "event_id",
      """AFTER MATCH SKIP TO NEXT ROW
        |PATTERN (V P)
        |DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
        |WITHIN INTERVAL '2' HOUR""".stripMargin)
    val directN = CepOps.cepSkipToNext(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "purchase", "2 HOUR")
    assert(toNext.columns.toSeq == Seq("user_id", "V_id", "P_id", "total_us"))
    assert(rows(toNext.select("user_id", "V_id", "P_id")) ==
      rows(directN.select("user_id", "a_id", "b_id")))

    val pastLast = MatchRecognize(ev, "user_id", "ts", "event_id",
      """AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (V P)
        |DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
        |WITHIN INTERVAL '2' HOUR""".stripMargin)
    val directL = CepOps.cepSkipPastLast(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "purchase",
      2L * 3600L * 1000000L)
    assert(rows(pastLast) == rows(directL))

    // PAST LAST on A B+ C is accepted redundantly (native semantics)
    val kleene = MatchRecognize(ev, "user_id", "ts", "event_id",
      """AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A B+ C)
        |DEFINE A AS event_type = 'view', B AS event_type = 'click',
        |       C AS event_type = 'purchase'
        |WITHIN INTERVAL '360' MINUTE""".stripMargin)
    assert(kleene.count() ==
      graft.SparkEntry.queries("cep_kleene")(spark, sf).count())
    // TO NEXT on an unsupported shape fails fast
    intercept[RuntimeException] {
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """AFTER MATCH SKIP TO NEXT ROW PATTERN (A B+ C)
          |DEFINE A AS true, B AS true, C AS true
          |WITHIN 1 hour""".stripMargin)
    }
  }

  test("PATTERN (A B+? C) compiles to cepKleeneRelaxed — batch and streaming parity") {
    val clause =
      """PATTERN (A B+? C)
        |DEFINE A AS event_type = 'view',
        |       B AS event_type = 'click',
        |       C AS event_type = 'purchase'
        |WITHIN INTERVAL '360' MINUTE""".stripMargin
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id", clause)
    val direct = CepOps.cepKleeneRelaxed(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", "360 MINUTE", maxPrefix = 3)
    assert(rows(mr) == rows(direct) && mr.count() > 0)
    // the same clause's rows ARE what the streaming automaton replays to
    import spark.implicits._
    val streamed = BoundedReplay.replayEvents(spark, sf)(s =>
      StreamOps.cepKleeneRelaxedStream(s, "user_id", "ts", "event_id",
        col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase",
        withinUs = 360L * 60L * 1000000L, maxPrefix = 3))(
      _ => spark.emptyDataset[KleeneMatch])
    assert(rows(streamed) == rows(mr))
  }

  test("MEASURES on PATTERN (A B+? C) compiles to cepKleeneRelaxedMeasures") {
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """MEASURES COUNT(B.*) AS n, SUM(B.value) AS sv, AVG(B.value) AS av,
        |         FIRST(B.event_id) AS f, LAST(B.event_id) AS l
        |PATTERN (A B+? C)
        |DEFINE A AS event_type = 'view',
        |       B AS event_type = 'click',
        |       C AS event_type = 'purchase'
        |WITHIN INTERVAL '360' MINUTE""".stripMargin)
    assert(mr.columns.toSeq ==
      Seq("user_id", "a_id", "c_id", "span_us", "n", "sv", "av", "f", "l"))
    val direct = CepOps.cepKleeneRelaxedMeasures(ev, "user_id", "ts",
        "event_id", col("event_type") === "view",
        col("event_type") === "click", col("event_type") === "purchase",
        "360 MINUTE", maxPrefix = 3, valueCol = col("value"))
      .select(col("user_id"), col("a_id"), col("c_id"), col("span_us"),
        col("n_b"), col("sum_b"), col("avg_b"), col("first_b_id"),
        col("last_b_id"))
    assert(rows(mr) == rows(direct) && mr.count() > 0)
  }

  test("MEASURES compiles to cepKleeneMeasures; match set unchanged") {
    val clause =
      """MEASURES COUNT(B.*) AS n_clicks, SUM(B.value) AS sv,
        |         AVG(B.value) AS av, FIRST(B.event_id) AS f, LAST(B.event_id) AS l
        |PATTERN (A B+ C)
        |DEFINE A AS event_type = 'view',
        |       B AS event_type = 'click',
        |       C AS event_type = 'purchase'
        |WITHIN INTERVAL '360' MINUTE""".stripMargin
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id", clause)
    assert(mr.columns.toSeq ==
      Seq("user_id", "a_id", "c_id", "span_us", "n_clicks", "sv", "av", "f", "l"))
    val direct = CepOps.cepKleeneMeasures(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", "360 MINUTE", col("value"))
    assert(rows(mr.select("user_id", "a_id", "n_clicks", "f", "l", "c_id", "sv", "av")) ==
      rows(direct.select("user_id", "a_id", "n_b", "first_b_id", "last_b_id",
        "c_id", "sum_b", "avg_b")))
    // measures must not change WHICH matches exist
    val plain = CepOps.cepKleene(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", "360 MINUTE")
    assert(rows(mr.select("user_id", "a_id", "c_id")) ==
      rows(plain.select("user_id", "a_id", "c_id")))
    // SUM/AVG over two different columns is rejected
    intercept[IllegalArgumentException] {
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """MEASURES SUM(B.value) AS s, AVG(B.user_id) AS a
          |PATTERN (A B+ C)
          |DEFINE A AS event_type = 'view', B AS event_type = 'click',
          |       C AS event_type = 'purchase'
          |WITHIN 360 minutes""".stripMargin)
    }
  }

  test("MEASURES on a plain sequence renames step ids; COUNT tracks optional presence") {
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """MEASURES FIRST(A.event_id) AS click_id, LAST(C.event_id) AS buy_id,
        |         COUNT(B.*) AS saw_error
        |PATTERN (A B? C)
        |DEFINE A AS event_type = 'click',
        |       B AS event_type = 'error',
        |       C AS event_type = 'purchase'
        |WITHIN 360 minutes""".stripMargin)
    assert(mr.columns.toSeq ==
      Seq("user_id", "click_id", "buy_id", "saw_error", "total_us"))
    val direct = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN (A B? C)
        |DEFINE A AS event_type = 'click',
        |       B AS event_type = 'error',
        |       C AS event_type = 'purchase'
        |WITHIN 360 minutes""".stripMargin)
    assert(rows(mr.select("user_id", "click_id", "buy_id", "total_us")) ==
      rows(direct.select("user_id", "A_id", "C_id", "total_us")))
    val withB = direct.filter(col("B_id").isNotNull).count()
    assert(mr.agg(sum(col("saw_error"))).head().getLong(0) == withB)
    // SUM on a sequence variable is rejected
    intercept[RuntimeException] {
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """MEASURES SUM(A.value) AS s
          |PATTERN (A B? C)
          |DEFINE A AS event_type = 'click', B AS event_type = 'error',
          |       C AS event_type = 'purchase'
          |WITHIN 360 minutes""".stripMargin)
    }
  }

  test("MEASURES on A{n}: COUNT is the literal n, FIRST/LAST are the run edges") {
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """MEASURES FIRST(A.event_id) AS run_start, LAST(A.event_id) AS run_end,
        |         COUNT(A.*) AS n_events
        |PATTERN (A{3}) DEFINE A AS event_type = 'click'
        |WITHIN INTERVAL '12' HOUR""".stripMargin)
    assert(mr.columns.toSeq ==
      Seq("user_id", "run_start", "run_end", "n_events", "span_us"))
    val direct = CepOps.cepTimes(ev, "user_id", "ts", "event_id",
      col("event_type") === "click", 3, "12 HOUR")
    assert(rows(mr.select("user_id", "run_start", "run_end", "span_us")) ==
      rows(direct.select("user_id", "first_id", "last_id", "span_us")))
    assert(mr.filter(col("n_events") =!= 3).isEmpty)
    // a run aggregate over a value column needs a loop variable
    intercept[RuntimeException] {
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """MEASURES SUM(A.value) AS s
          |PATTERN (A{3}) DEFINE A AS event_type = 'click'
          |WITHIN 12 hours""".stripMargin)
    }
  }

  test("MEASURES on the 2-step SKIP shapes renames step ids (no silent drop)") {
    val toNext = MatchRecognize(ev, "user_id", "ts", "event_id",
      """MEASURES FIRST(V.event_id) AS view_id, LAST(P.event_id) AS buy_id
        |AFTER MATCH SKIP TO NEXT ROW
        |PATTERN (V P)
        |DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
        |WITHIN INTERVAL '2' HOUR""".stripMargin)
    assert(toNext.columns.toSeq ==
      Seq("user_id", "view_id", "buy_id", "total_us"))
    val directN = CepOps.cepSkipToNext(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "purchase", "2 HOUR")
    assert(rows(toNext.select("user_id", "view_id", "buy_id")) ==
      rows(directN.select("user_id", "a_id", "b_id")))

    val pastLast = MatchRecognize(ev, "user_id", "ts", "event_id",
      """MEASURES COUNT(V.*) AS n_v, LAST(P.event_id) AS buy_id
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (V P)
        |DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
        |WITHIN INTERVAL '2' HOUR""".stripMargin)
    assert(pastLast.columns.toSeq == Seq("user_id", "n_v", "buy_id"))
    val directL = CepOps.cepSkipPastLast(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "purchase",
      2L * 3600L * 1000000L)
    assert(rows(pastLast.select("user_id", "buy_id")) ==
      rows(directL.select("user_id", "b_id")))
    assert(pastLast.filter(col("n_v") =!= 1L).isEmpty)
    // SUM on a skip shape is rejected, not dropped
    intercept[RuntimeException] {
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """MEASURES SUM(V.value) AS s
          |AFTER MATCH SKIP TO NEXT ROW
          |PATTERN (V P)
          |DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
          |WITHIN 2 hours""".stripMargin)
    }
  }

  test("malformed clauses fail fast") {
    intercept[RuntimeException] {
      MatchRecognize(ev, "user_id", "ts", "event_id",
        "PATTERN (A B+ C) DEFINE A AS event_type = 'view' WITHIN 1 hour")
    } // B, C undefined
    intercept[RuntimeException] {
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """PATTERN (A B+ C+) DEFINE A AS true, B AS true, C AS true
          |WITHIN 1 hour""".stripMargin)
    } // unsupported double quantifier
    intercept[RuntimeException] {
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """PATTERN (A B+ C)
          |DEFINE A AS event_type = 'view', B AS event_type = 'click',
          |       C AS event_type = 'purchase'""".stripMargin)
    } // missing WITHIN
  }
}
