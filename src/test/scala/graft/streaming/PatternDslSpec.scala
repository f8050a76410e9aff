package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The MATCH_RECOGNIZE-flavored builder compiles each supported shape
  * to the exact same result as the direct operator call — including
  * the oracle-carrying `cep_pattern` key re-expressed through it.
  */
class PatternDslSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def ev = Tables.events(spark, sf)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.mkString("|")).sorted

  test("chained next()/optional compiles to cepPattern == the cep_pattern key") {
    val dsl = Pattern.begin("click", col("event_type") === "click")
      .next("error", col("event_type") === "error",
        within = "360 minutes", optional = true)
      .next("purchase", col("event_type") === "purchase", within = "360 minutes")
      .over(ev, "user_id", "ts", "event_id")
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_pattern")(spark, sf)))
  }

  test("oneOrMore() compiles to cepKleene") {
    val dsl = Pattern.begin("view", col("event_type") === "view")
      .next("click", col("event_type") === "click").oneOrMore()
      .next("purchase", col("event_type") === "purchase")
      .within("360 minutes")
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepKleene(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", "360 minutes")
    assert(rows(dsl) == rows(direct) && dsl.count() > 0)
  }

  test("oneOrMore().relaxed(k) compiles to cepKleeneRelaxed") {
    val dsl = Pattern.begin("view", col("event_type") === "view")
      .next("click", col("event_type") === "click").oneOrMore().relaxed(3)
      .next("purchase", col("event_type") === "purchase")
      .within("360 minutes")
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepKleeneRelaxed(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", "360 minutes", maxPrefix = 3)
    assert(rows(dsl) == rows(direct) && dsl.count() > 0)
  }

  test("timesOrMore(n) is the Kleene form with a minimum run length") {
    val dsl = Pattern.begin("view", col("event_type") === "view")
      .next("click", col("event_type") === "click").timesOrMore(2)
      .next("purchase", col("event_type") === "purchase")
      .within("360 minutes")
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepKleene(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", "360 minutes")
      .filter(col("n_b") >= 2)
    assert(rows(dsl) == rows(direct))
    assert(dsl.count() < CepOps.cepKleene(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", "360 minutes").count(),
      "fixture must contain single-B runs for the bound to bite")
  }

  test("until() compiles to cepKleeneUntil (stopper outside the match)") {
    val dsl = Pattern.begin("view", col("event_type") === "view")
      .next("click", col("event_type") === "click").oneOrMore()
      .until("error", col("event_type") === "error")
      .within("360 minutes")
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepKleeneUntil(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "error", "360 minutes")
    assert(rows(dsl) == rows(direct) && dsl.count() > 0)
    // the stopper is not part of the match: no c_id column, span ends at last B
    assert(!dsl.columns.contains("c_id"))
  }

  test("notFollowedBy() compiles to cepAbsence") {
    val dsl = Pattern.begin("click", col("event_type") === "click")
      .notFollowedBy("purchase", col("event_type") === "purchase")
      .within("360 minutes")
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepAbsence(ev, "user_id", "ts", "event_id",
      col("event_type") === "click", col("event_type") === "purchase",
      "360 minutes")
    assert(rows(dsl) == rows(direct))
  }

  test("times(n).consecutive() compiles to cepTimes") {
    val dsl = Pattern.begin("click", col("event_type") === "click")
      .times(3).consecutive().within("12 hours")
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepTimes(ev, "user_id", "ts", "event_id",
      col("event_type") === "click", n = 3, within = "12 hours")
    assert(rows(dsl) == rows(direct))
  }

  test("nextAny compiles to cepAlternation == the cep_alternation key") {
    val dsl = Pattern.begin("click", col("event_type") === "click")
      .nextAny("mid", "360 minutes",
        "error" -> (col("event_type") === "error"),
        "view" -> (col("event_type") === "view"))
      .next("purchase", col("event_type") === "purchase",
        within = "360 minutes")
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepAlternation(ev, "user_id", "ts", "event_id", Seq(
      CepOps.AltStep("click", Seq("click" -> (col("event_type") === "click"))),
      CepOps.AltStep("mid", Seq(
        "error" -> (col("event_type") === "error"),
        "view" -> (col("event_type") === "view")), "360 minutes"),
      CepOps.AltStep("purchase",
        Seq("purchase" -> (col("event_type") === "purchase")),
        "360 minutes")))
    assert(dsl.columns.contains("mid_branch"),
      "multi-branch slots must carry the branch tag")
    assert(!dsl.columns.contains("click_branch"),
      "single-branch slots must not")
    assert(rows(dsl) == rows(direct) && dsl.count() > 0)
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_alternation")(spark, sf)))
  }

  test("MATCH_RECOGNIZE PATTERN (A (E|V) C) routes to cepAlternation") {
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN (A (E|V) C)
         DEFINE A AS event_type = 'click',
                E AS event_type = 'error',
                V AS event_type = 'view',
                C AS event_type = 'purchase'
         WITHIN INTERVAL '360' MINUTE""")
    assert(mr.columns.toSeq == Seq("user_id", "A_id", "E_or_V_id",
      "E_or_V_branch", "C_id", "total_us"))
    // SQL WITHIN bounds the WHOLE match: per-slot bound is the full
    // interval, closed by the total_us filter
    val direct = CepOps.cepAlternation(ev, "user_id", "ts", "event_id", Seq(
        CepOps.AltStep("A", Seq("A" -> (col("event_type") === "click"))),
        CepOps.AltStep("E_or_V", Seq(
          "E" -> (col("event_type") === "error"),
          "V" -> (col("event_type") === "view")), "360 MINUTE"),
        CepOps.AltStep("C", Seq("C" -> (col("event_type") === "purchase")),
          "360 MINUTE")))
      .filter(col("total_us") <= 360L * 60L * 1000000L)
    assert(rows(mr) == rows(direct) && mr.count() > 0)
  }

  test("an event matching BOTH branches emits one match per branch") {
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val df = Seq((1L, t(0), 10L, "a"), (1L, t(5), 20L, "b"),
      (1L, t(10), 30L, "c")).toDF("user_id", "ts", "event_id", "event_type")
    val got = CepOps.cepAlternation(df, "user_id", "ts", "event_id", Seq(
        CepOps.AltStep("s", Seq("s" -> (col("event_type") === "a"))),
        CepOps.AltStep("m", Seq(
          "by_type" -> (col("event_type") === "b"),
          "by_id" -> (col("event_id") === 20L)), "60 minutes"),
        CepOps.AltStep("e", Seq("e" -> (col("event_type") === "c")),
          "60 minutes")))
      .collect().map(r => (r.getLong(2), r.getString(3))).toSet
    assert(got == Set((20L, "by_type"), (20L, "by_id")),
      s"regex alternation semantics: one match per branch, got $got")
  }

  test("group(...).times(2) compiles to cepGroupTimes == the cep_group_times key") {
    val dsl = Pattern.group("360 minutes",
        "click" -> (col("event_type") === "click"),
        "view" -> (col("event_type") === "view"))
      .times(2)
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepGroupTimes(ev, "user_id", "ts", "event_id",
      Seq("click" -> (col("event_type") === "click"),
        "view" -> (col("event_type") === "view")), n = 2,
      within = "360 minutes")
    assert(dsl.columns.toSeq == Seq("user_id", "click_1_id", "view_1_id",
      "click_2_id", "view_2_id", "total_us"),
      "every repetition's events bound as columns")
    assert(rows(dsl) == rows(direct))
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_group_times")(spark, sf)))
  }

  test("times(n,m).consecutive(): DSL == direct == MATCH_RECOGNIZE == the cep_times_range key") {
    val dsl = Pattern.begin("click", col("event_type") === "click")
      .times(2, 3).consecutive().within("12 hours")
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepTimesRange(ev, "user_id", "ts", "event_id",
      col("event_type") === "click", n = 2, m = 3, within = "12 hours")
    assert(rows(dsl) == rows(direct))
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_times_range")(spark, sf)))
    // the reps slices ARE the fixed-count forms
    assert(rows(dsl.filter(col("reps") === 3).drop("reps")) ==
      rows(CepOps.cepTimes(ev, "user_id", "ts", "event_id",
        col("event_type") === "click", n = 3, within = "12 hours")))
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN (click{2,3})
        |DEFINE click AS event_type = 'click'
        |WITHIN INTERVAL '12' HOUR""".stripMargin)
    assert(rows(mr) == rows(dsl))
    intercept[IllegalArgumentException] {
      CepOps.cepTimesRange(ev, "user_id", "ts", "event_id",
        col("event_type") === "click", n = 3, m = 3, within = "1 hours")
    }
  }

  test("group(...).times(1,2) range: DSL == direct == MATCH_RECOGNIZE == the cep_group_range key") {
    val grp = Seq("click" -> (col("event_type") === "click"),
      "view" -> (col("event_type") === "view"))
    val dsl = Pattern.group("360 minutes", grp: _*)
      .times(1, 2)
      .over(ev, "user_id", "ts", "event_id")
    assert(dsl.columns.toSeq == Seq("user_id", "click_1_id", "view_1_id",
      "click_2_id", "view_2_id", "reps", "total_us"),
      "per-repetition columns null-padded to the m-shape plus reps")
    val direct = CepOps.cepGroupRange(ev, "user_id", "ts", "event_id",
      grp, n = 1, m = 2, within = "360 minutes")
    assert(rows(dsl) == rows(direct))
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_group_range")(spark, sf)))
    // the r-rep slice IS the fixed-count expansion: reps=2 rows equal
    // cepGroupTimes(n=2), reps=1 rows equal cepGroupTimes(n=1) (with
    // the pad columns null)
    val r2 = dsl.filter(col("reps") === 2).drop("reps")
    assert(rows(r2) == rows(CepOps.cepGroupTimes(ev, "user_id", "ts",
        "event_id", grp, n = 2, within = "360 minutes")),
      "reps=2 slice must equal the fixed times(2) expansion")
    val r1 = dsl.filter(col("reps") === 1)
    assert(r1.filter(col("click_2_id").isNotNull ||
      col("view_2_id").isNotNull).count() == 0,
      "short matches must null-pad the unreached repetitions")
    assert(rows(r1.select("user_id", "click_1_id", "view_1_id", "total_us")) ==
      rows(CepOps.cepGroupTimes(ev, "user_id", "ts", "event_id", grp,
        n = 1, within = "360 minutes")),
      "reps=1 slice must equal the fixed times(1) expansion")
    // SQL face: (click view){1,2} — whole-match WITHIN bound
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN ((click view){1,2})
        |DEFINE click AS event_type = 'click',
        |       view AS event_type = 'view'
        |WITHIN INTERVAL '360' MINUTE""".stripMargin)
    assert(rows(mr.select(dsl.columns.map(col): _*)) ==
      rows(dsl.filter(col("total_us") <= 360L * 60000000L)),
      "MATCH_RECOGNIZE must equal the DSL under the whole-match bound")
    // loud rejects: degenerate range, over-cap, range mixed with outer
    intercept[IllegalArgumentException] {
      CepOps.cepGroupRange(ev, "user_id", "ts", "event_id", grp,
        n = 2, m = 2, within = "60 minutes")
    }
    intercept[IllegalArgumentException] {
      CepOps.cepGroupRange(ev, "user_id", "ts", "event_id", grp,
        n = 1, m = 9, within = "60 minutes")
    }
    intercept[RuntimeException] { // MR face: A (B C){1,2} not compiled
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """PATTERN (A (B C){1,2})
          |DEFINE A AS event_type = 'signup', B AS event_type = 'click',
          |       C AS event_type = 'view'
          |WITHIN INTERVAL '60' MINUTE""".stripMargin)
    }
  }

  test("group(...).oneOrMore emits one match per repetition count == the cep_group_kleene key") {
    val dsl = Pattern.group("360 minutes",
        "click" -> (col("event_type") === "click"),
        "view" -> (col("event_type") === "view"))
      .oneOrMore(maxReps = 3)
      .over(ev, "user_id", "ts", "event_id")
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_group_kleene")(spark, sf)))
    val byReps = dsl.groupBy("reps").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byReps.keySet.subsetOf(Set(1, 2, 3)) && byReps.contains(1))
    // Flink oneOrMore emission: a k-rep run also reports its prefixes,
    // so every 2-rep match's (key, first) pair exists among the 1-reps
    val firsts1 = dsl.filter(col("reps") === 1)
      .select("user_id", "first_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val firsts2 = dsl.filter(col("reps") === 2)
      .select("user_id", "first_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(firsts2.subsetOf(firsts1), "prefix matches must be emitted")
  }

  test("MIXED group quantifier A (B C){2} D: DSL == direct == MATCH_RECOGNIZE == the cep_group_mixed key") {
    val sub = ev.filter(col("user_id") < 30)
    val dsl = Pattern.group("1440 minutes",
        "hi" -> (col("value") >= 50), "lo" -> (col("value") < 50))
      .times(2)
      .precededBy("signup", col("event_type") === "signup")
      .followedBy("purchase", col("event_type") === "purchase")
      .over(sub, "user_id", "ts", "event_id")
    assert(dsl.columns.toSeq == Seq("user_id", "signup_id", "hi_1_id",
      "lo_1_id", "hi_2_id", "lo_2_id", "purchase_id", "total_us"),
      "outer steps and every repetition's events bound as columns")
    val direct = CepOps.cepGroupTimesMixed(sub, "user_id", "ts",
      "event_id",
      pre = Seq("signup" -> (col("event_type") === "signup")),
      group = Seq("hi" -> (col("value") >= 50),
        "lo" -> (col("value") < 50)),
      n = 2,
      post = Seq("purchase" -> (col("event_type") === "purchase")),
      within = "1440 minutes")
    assert(rows(dsl) == rows(direct))
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_group_mixed")(spark, sf)))
    val mr = MatchRecognize(sub, "user_id", "ts", "event_id",
      """PATTERN (signup (hi lo){2} purchase)
        |DEFINE signup AS event_type = 'signup',
        |       hi AS value >= 50,
        |       lo AS value < 50,
        |       purchase AS event_type = 'purchase'
        |WITHIN INTERVAL '1440' MINUTE""".stripMargin)
    // the SQL face closes WITHIN over the WHOLE match (per-step bound
    // + total filter), so it selects the subset of the relaxed
    // per-step chains whose total span fits the interval
    val mrRows = rows(mr.select(dsl.columns.map(col): _*))
    val dslTotal = rows(dsl.filter(col("total_us") <= 1440L * 60000000L))
    assert(mrRows == dslTotal,
      "MATCH_RECOGNIZE must equal the DSL under the whole-match bound")
  }

  test("mixed group quantifier rejects the Kleene form and bad mixes loudly") {
    intercept[IllegalArgumentException] { // (B C)+ with outer steps
      Pattern.group("60 minutes",
          "b" -> lit(true), "c" -> lit(true))
        .oneOrMore(2)
        .precededBy("a", lit(true))
    }
    intercept[RuntimeException] { // MR face: (B C)+ D
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """PATTERN ((B C)+ D)
          |DEFINE B AS event_type = 'click', C AS event_type = 'view',
          |       D AS event_type = 'purchase'
          |WITHIN INTERVAL '60' MINUTE""".stripMargin)
    }
    intercept[IllegalArgumentException] { // colliding outer name
      CepOps.cepGroupTimesMixed(ev, "user_id", "ts", "event_id",
        pre = Seq("b_1" -> lit(true)),
        group = Seq("b" -> lit(true), "c" -> lit(true)), n = 2,
        post = Nil, within = "60 minutes")
    }
  }

  test("groupAny(...).times(2) binds branch identity per repetition == the cep_group_alt key") {
    val sub = ev.filter(col("user_id") < 30)
    val dsl = Pattern.groupAny("1440 minutes",
        "m" -> Seq("click" -> (col("event_type") === "click"),
          "view" -> (col("event_type") === "view")),
        "p" -> Seq("purchase" -> (col("event_type") === "purchase")))
      .times(2)
      .over(sub, "user_id", "ts", "event_id")
    assert(dsl.columns.toSeq == Seq("user_id", "m_1_id", "m_1_branch",
      "p_1_id", "m_2_id", "m_2_branch", "p_2_id", "total_us"),
      "multi-branch members bind a branch column PER repetition")
    val direct = CepOps.cepGroupAlt(sub, "user_id", "ts", "event_id",
      Seq("m" -> Seq("click" -> (col("event_type") === "click"),
        "view" -> (col("event_type") === "view")),
        "p" -> Seq("purchase" -> (col("event_type") === "purchase"))),
      n = 2, within = "1440 minutes")
    assert(rows(dsl) == rows(direct))
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_group_alt")(spark, sf)))
    // the two repetitions choose branches INDEPENDENTLY: both orders
    // must occur in a fixture rich enough to contain them
    val combos = dsl.select("m_1_branch", "m_2_branch").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(combos.size >= 2, s"expected mixed branch combos, got $combos")
    intercept[IllegalArgumentException] { // plain form must use group()
      CepOps.cepGroupAlt(ev, "user_id", "ts", "event_id",
        Seq("a" -> Seq("a" -> lit(true)), "b" -> Seq("b" -> lit(true))),
        n = 2, within = "60 minutes")
    }
  }

  test("group quantifier semantics on a hand-built alternating run") {
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // a@0 b@5 a@10 b@15 — relaxed contiguity inside a 60-min band
    val df = Seq((1L, t(0), 10L, "a"), (1L, t(5), 20L, "b"),
      (1L, t(10), 30L, "a"), (1L, t(15), 40L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val grp = Seq("x" -> (col("event_type") === "a"),
      "y" -> (col("event_type") === "b"))
    val twice = CepOps.cepGroupTimes(df, "user_id", "ts", "event_id",
      grp, n = 2, within = "60 minutes").collect()
    assert(twice.length == 1 &&
      twice(0).getLong(1) == 10L && twice(0).getLong(2) == 20L &&
      twice(0).getLong(3) == 30L && twice(0).getLong(4) == 40L,
      s"exactly the a0 b5 a10 b15 chain, got ${twice.toSeq}")
    val plus = CepOps.cepGroupKleene(df, "user_id", "ts", "event_id",
      grp, maxReps = 2, within = "60 minutes")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // reps=1: (a0,b5) (a0,b15) (a10,b15); reps=2: the full chain
    assert(plus == Set((10L, 20L, 1), (10L, 40L, 1), (30L, 40L, 1),
      (10L, 40L, 2)), s"got $plus")
  }

  test("MATCH_RECOGNIZE group quantifiers route and reject correctly") {
    val defs = """DEFINE A AS event_type = 'click',
                         B AS event_type = 'view'
                  WITHIN INTERVAL '720' MINUTE"""
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      s"PATTERN ((A B){2}) $defs")
    val direct = CepOps.cepGroupTimes(ev, "user_id", "ts", "event_id",
        Seq("A" -> (col("event_type") === "click"),
          "B" -> (col("event_type") === "view")), n = 2,
        within = "720 MINUTE")
      .filter(col("total_us") <= 720L * 60L * 1000000L)
    assert(rows(mr) == rows(direct))
    val plus = MatchRecognize(ev, "user_id", "ts", "event_id",
      s"PATTERN ((A B)+) $defs", groupMaxReps = 2)
    assert(plus.columns.toSeq ==
      Seq("user_id", "first_id", "last_id", "reps", "total_us"))
    assert(plus.filter(col("reps") > 2).count() == 0)
    // `A (A B){2}` is the MIXED shape — it now compiles (r14); the
    // unrolled columns are A_id then A_1/B_1/A_2/B_2
    val mixed = MatchRecognize(ev, "user_id", "ts", "event_id",
      s"PATTERN (A (A B){2}) $defs")
    assert(mixed.columns.toSeq == Seq("user_id", "A_id", "A_1_id",
      "B_1_id", "A_2_id", "B_2_id", "total_us"))
    intercept[RuntimeException] { // Kleene groups do NOT mix
      MatchRecognize(ev, "user_id", "ts", "event_id",
        s"PATTERN (A (A B)+) $defs")
    }
    intercept[RuntimeException] { // sequence group needs a quantifier
      MatchRecognize(ev, "user_id", "ts", "event_id",
        s"PATTERN ((A B)) $defs")
    }
    intercept[IllegalArgumentException] { // the maxReps cap is hard
      CepOps.cepGroupKleene(ev, "user_id", "ts", "event_id",
        Seq("A" -> lit(true), "B" -> lit(true)), maxReps = 9,
        within = "60 minutes")
    }
  }

  test("malformed shapes fail fast with a clear message") {
    intercept[RuntimeException] {
      Pattern.begin("a", lit(true)).next("b", lit(true)).oneOrMore()
        .over(ev, "user_id", "ts", "event_id") // no closing step
    }
    intercept[RuntimeException] {
      Pattern.begin("a", lit(true))
        .notFollowedBy("b", lit(true))
        .over(ev, "user_id", "ts", "event_id") // missing within
    }
  }

  test("alternation slots REJECT quantified/absence shapes instead of degrading to the first branch") {
    // every non-alternation compile case reads only steps(i).pred
    // (seeded with the FIRST branch), so letting one of these through
    // would silently ignore every other branch — they must throw
    val pView = col("event_type") === "view"
    val pClick = col("event_type") === "click"
    val pErr = col("event_type") === "error"
    intercept[IllegalArgumentException] { // alternation + absence
      Pattern.beginAny("s", "v" -> pView, "c" -> pClick)
        .notFollowedBy("e", pErr).within("60 minutes")
        .over(ev, "user_id", "ts", "event_id")
    }
    intercept[IllegalArgumentException] { // alternation + times(n)
      Pattern.beginAny("s", "v" -> pView, "c" -> pClick)
        .times(2).consecutive().within("60 minutes")
        .over(ev, "user_id", "ts", "event_id")
    }
    intercept[IllegalArgumentException] { // alternation + oneOrMore
      Pattern.begin("a", pView)
        .nextAny("m", "60 minutes", "c" -> pClick, "e" -> pErr)
        .oneOrMore().next("z", pErr, "60 minutes")
        .over(ev, "user_id", "ts", "event_id")
    }
    intercept[IllegalArgumentException] { // alternation + until
      Pattern.begin("a", pView)
        .nextAny("m", "60 minutes", "c" -> pClick, "e" -> pErr)
        .oneOrMore().until("u", pErr).within("60 minutes")
        .over(ev, "user_id", "ts", "event_id")
    }
  }

  test("A{n,m}? reluctant: DSL == direct == MATCH_RECOGNIZE == the key; argmin per anchor") {
    val dsl = Pattern.begin("click", col("event_type") === "click")
      .times(2, 3).consecutive().within("12 hours")
      .reluctantlyFollowedBy("purchase", col("event_type") === "purchase")
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepTimesRangeReluctant(ev, "user_id", "ts",
      "event_id", col("event_type") === "click", n = 2, m = 3,
      within = "12 hours", "purchase", col("event_type") === "purchase")
    assert(rows(dsl) == rows(direct))
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_times_range_reluctant")(spark, sf)))
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN (click{2,3}? purchase)
        |DEFINE click AS event_type = 'click',
        |       purchase AS event_type = 'purchase'
        |WITHIN INTERVAL '12' HOUR""".stripMargin)
    assert(rows(mr) == rows(dsl))
    // reluctance = per-anchor argmin: one reps value per (key, first_id)
    assert(dsl.groupBy("user_id", "first_id")
      .agg(countDistinct(col("reps")).as("n"))
      .filter(col("n") > 1).count() == 0,
      "an anchor must carry exactly its minimal count")
    // standalone {n,m}? is rejected (it degenerates to the minimum)
    intercept[RuntimeException] {
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """PATTERN (click{2,3}?)
          |DEFINE click AS event_type = 'click'
          |WITHIN INTERVAL '12' HOUR""".stripMargin)
    }
    // GREEDY mirror (SQL default): DSL == direct == MR == the key,
    // and the two extremes genuinely differ on this fixture
    val g = Pattern.begin("click", col("event_type") === "click")
      .times(2, 3).consecutive().within("12 hours")
      .greedilyFollowedBy("purchase", col("event_type") === "purchase")
      .over(ev, "user_id", "ts", "event_id")
    assert(rows(g) == rows(CepOps.cepTimesRangeGreedy(ev, "user_id",
      "ts", "event_id", col("event_type") === "click", n = 2, m = 3,
      within = "12 hours", "purchase", col("event_type") === "purchase")))
    assert(rows(g) == rows(
      graft.SparkEntry.queries("cep_times_range_greedy")(spark, sf)))
    val gmr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN (click{2,3} purchase)
        |DEFINE click AS event_type = 'click',
        |       purchase AS event_type = 'purchase'
        |WITHIN INTERVAL '12' HOUR""".stripMargin)
    assert(rows(gmr) == rows(g))
    assert(g.groupBy("user_id", "first_id")
      .agg(countDistinct(col("reps")).as("n"))
      .filter(col("n") > 1).count() == 0,
      "an anchor must carry exactly its maximal count")
  }

  test("reluctant semantics on a hand-built run: a 2-run without a closer loses to the 3-run") {
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // clicks at 0, 5, 10; purchase at 18; band 12 minutes (bounding
    // BOTH the run's own span and the closer gap):
    //  - anchor click@0 (id 1): 2-run tail=5 -> band (5,17], p@18 out;
    //    3-run spans 10 <= 12, tail=10 -> band (10,22], p@18 in ->
    //    reps=3 wins
    //  - anchor click@5 (id 2): 2-run tail=10 -> p@18 in -> reps=2
    val df = Seq((1L, t(0), 1L, "click"), (1L, t(5), 2L, "click"),
      (1L, t(10), 3L, "click"), (1L, t(18), 9L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = CepOps.cepTimesRangeReluctant(df, "user_id", "ts",
        "event_id", col("event_type") === "click", n = 2, m = 3,
        within = "12 minutes", "purchase", col("event_type") === "purchase")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(out == Set((1L, 3L, 9L, 3), (2L, 3L, 9L, 2)),
      s"expected anchor@0 to stretch to 3 reps and anchor@10 to stay " +
        s"at 2, got $out")
  }

  test("(A B){n,m}? reluctant group: DSL == direct == MATCH_RECOGNIZE == the key; loud rejects") {
    val grp = Seq("click" -> (col("event_type") === "click"),
      "view" -> (col("event_type") === "view"))
    val dsl = Pattern.group("360 minutes", grp: _*)
      .times(1, 2)
      .reluctant
      .followedBy("signup", col("event_type") === "signup")
      .over(ev, "user_id", "ts", "event_id")
    assert(dsl.columns.toSeq == Seq("user_id", "click_1_id", "view_1_id",
      "click_2_id", "view_2_id", "signup_id", "reps", "total_us"))
    val direct = CepOps.cepGroupRangeReluctant(ev, "user_id", "ts",
      "event_id", grp, n = 1, m = 2, within = "360 minutes",
      post = Seq("signup" -> (col("event_type") === "signup")))
    assert(rows(dsl) == rows(direct))
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_group_range_reluctant")(spark, sf)))
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN ((click view){1,2}? signup)
        |DEFINE click AS event_type = 'click',
        |       view AS event_type = 'view',
        |       signup AS event_type = 'signup'
        |WITHIN INTERVAL '360' MINUTE""".stripMargin)
    assert(rows(mr.select(dsl.columns.map(col): _*)) ==
      rows(dsl.filter(col("total_us") <= 360L * 60000000L)),
      "MATCH_RECOGNIZE must equal the DSL under the whole-match bound")
    // a surviving 2-rep anchor is one with NO 1-rep completion: its
    // anchor must be absent from the 1-rep leg of the greedy union
    val oneRep = CepOps.cepGroupRangeReluctant(ev, "user_id", "ts",
      "event_id", grp, n = 1, m = 2, within = "360 minutes",
      post = Seq("signup" -> (col("event_type") === "signup")))
      .filter(col("reps") === 1).select("user_id", "click_1_id")
    assert(dsl.filter(col("reps") === 2)
      .join(oneRep, Seq("user_id", "click_1_id"), "left_semi")
      .count() == 0,
      "an anchor with a 1-rep completion must never emit at 2 reps")
    // loud rejects: no post step; reluctant group not leading in MR
    intercept[IllegalArgumentException] {
      CepOps.cepGroupRangeReluctant(ev, "user_id", "ts", "event_id",
        grp, n = 1, m = 2, within = "60 minutes", post = Nil)
    }
    intercept[RuntimeException] {
      Pattern.group("60 minutes", grp: _*).times(1, 2).reluctant
        .over(ev, "user_id", "ts", "event_id") // no followedBy
    }
    intercept[RuntimeException] { // standalone reluctant group in MR
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """PATTERN ((click view){1,2}?)
          |DEFINE click AS event_type = 'click',
          |       view AS event_type = 'view'
          |WITHIN INTERVAL '60' MINUTE""".stripMargin)
    }
    intercept[RuntimeException] { // pre/post names must not collide
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """PATTERN (signup (click view){1,2}? signup)
          |DEFINE click AS event_type = 'click',
          |       view AS event_type = 'view',
          |       signup AS event_type = 'signup'
          |WITHIN INTERVAL '60' MINUTE""".stripMargin)
    }
    val fixedReluctant = intercept[RuntimeException] {
      // (A B){n}? is not a range — clean reject, not a parse crash
      MatchRecognize(ev, "user_id", "ts", "event_id",
        """PATTERN ((click view){2}? signup)
          |DEFINE click AS event_type = 'click',
          |       view AS event_type = 'view',
          |       signup AS event_type = 'signup'
          |WITHIN INTERVAL '60' MINUTE""".stripMargin)
    }
    assert(fixedReluctant.getMessage.contains("not a range"),
      s"expected the fixed-count-reluctant reject, got: " +
        s"${fixedReluctant.getMessage}")
  }

  test("(A B){n,m} greedy group: DSL == direct == MATCH_RECOGNIZE == the key; argmax per anchor") {
    val grp = Seq("click" -> (col("event_type") === "click"),
      "view" -> (col("event_type") === "view"))
    val dsl = Pattern.group("1440 minutes", grp: _*)
      .times(1, 2)
      .greedy
      .followedBy("signup", col("event_type") === "signup")
      .over(ev, "user_id", "ts", "event_id")
    val direct = CepOps.cepGroupRangeGreedy(ev, "user_id", "ts",
      "event_id", grp, n = 1, m = 2, within = "1440 minutes",
      post = Seq("signup" -> (col("event_type") === "signup")))
    assert(rows(dsl) == rows(direct))
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_group_range_greedy")(spark, sf)))
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN ((click view){1,2} signup)
        |DEFINE click AS event_type = 'click',
        |       view AS event_type = 'view',
        |       signup AS event_type = 'signup'
        |WITHIN INTERVAL '1440' MINUTE""".stripMargin)
    // NOT dsl.filter(total_us <= bound): under argMAX the whole-match
    // bound must prune BEFORE the pick — an anchor whose longest count
    // busts the bound falls through to its in-bound shorter completion
    // (this fixture holds such an anchor at sf0.001: user 2, click 794,
    // whose 2-rep completion exceeds 1440 min but whose 1-rep fits —
    // filter-after would drop the anchor entirely, the r16 ADVICE
    // divergence)
    val bounded = CepOps.cepGroupRangeGreedy(ev, "user_id", "ts",
      "event_id", grp, n = 1, m = 2, within = "1440 minutes",
      post = Seq("signup" -> (col("event_type") === "signup")),
      matchWithinUs = Some(1440L * 60000000L))
    assert(rows(mr.select(dsl.columns.map(col): _*)) == rows(bounded),
      "MATCH_RECOGNIZE must equal the kernel with the bound INSIDE")
    assert(rows(mr.select(dsl.columns.map(col): _*)) !=
      rows(dsl.filter(col("total_us") <= 1440L * 60000000L)),
      "filter-after-argmax must visibly diverge on this fixture — " +
        "the reason the bound rides inside the kernel")
    // greediness = per-anchor argmax: a surviving 1-rep anchor is one
    // with NO 2-rep completion
    val twoRep = direct.filter(col("reps") === 2)
      .select("user_id", "click_1_id")
    assert(dsl.filter(col("reps") === 1)
      .join(twoRep, Seq("user_id", "click_1_id"), "left_semi")
      .count() == 0,
      "an anchor with a 2-rep completion must never emit at 1 rep")
    // the two extremes genuinely differ where an anchor completes at
    // BOTH counts (sf0.001 holds no such anchor; hand-build one):
    // click@0 view@5 signup@8 closes 1 rep; click@10 view@15 signup@20
    // extends the same anchor to an in-band 2-rep completion
    locally {
      val sp = spark
      import sp.implicits._
      import java.sql.Timestamp
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      val df = Seq((1L, t(0), 1L, "click"), (1L, t(5), 2L, "view"),
        (1L, t(8), 3L, "signup"), (1L, t(10), 4L, "click"),
        (1L, t(15), 5L, "view"), (1L, t(20), 6L, "signup"))
        .toDF("user_id", "ts", "event_id", "event_type")
      val post = Seq("signup" -> (col("event_type") === "signup"))
      def picks(d: org.apache.spark.sql.DataFrame) = d
        .filter(col("click_1_id") === 1L)
        .select("reps").collect().map(_.getInt(0)).toSet
      assert(picks(CepOps.cepGroupRangeReluctant(df, "user_id", "ts",
        "event_id", grp, n = 1, m = 2, within = "60 minutes",
        post = post)) == Set(1), "argmin must stop at the 1-rep closer")
      assert(picks(CepOps.cepGroupRangeGreedy(df, "user_id", "ts",
        "event_id", grp, n = 1, m = 2, within = "60 minutes",
        post = post)) == Set(2), "argmax must stretch to the 2-rep closer")
    }
    // standalone greedy range keeps the all-counts emission (the MR
    // face routes it to cepGroupRange, not the argmax kernel)
    val standalone = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN ((click view){1,2})
        |DEFINE click AS event_type = 'click',
        |       view AS event_type = 'view'
        |WITHIN INTERVAL '1440' MINUTE""".stripMargin)
    val allCounts = CepOps.cepGroupRange(ev, "user_id", "ts", "event_id",
      grp, n = 1, m = 2, within = "1440 minutes")
      .filter(col("total_us") <= 1440L * 60000000L)
    assert(rows(standalone) == rows(allCounts))
    // standalone greedy through the kernel is rejected loudly
    intercept[IllegalArgumentException] {
      CepOps.cepGroupRangeGreedy(ev, "user_id", "ts", "event_id",
        grp, n = 1, m = 2, within = "60 minutes", post = Nil)
    }
  }

  test("pre-step group range: anchor is the MATCH START (pre.head), DSL == direct == MR == the key") {
    val grp = Seq("click" -> (col("event_type") === "click"),
      "view" -> (col("event_type") === "view"))
    val dsl = Pattern.group("1440 minutes", grp: _*)
      .times(1, 2)
      .reluctant
      .precededBy("signup", col("event_type") === "signup")
      .followedBy("purchase", col("event_type") === "purchase")
      .over(ev, "user_id", "ts", "event_id")
    assert(dsl.columns.toSeq == Seq("user_id", "signup_id", "click_1_id",
      "view_1_id", "click_2_id", "view_2_id", "purchase_id", "reps",
      "total_us"))
    val direct = CepOps.cepGroupRangeReluctant(ev, "user_id", "ts",
      "event_id", grp, n = 1, m = 2, within = "1440 minutes",
      post = Seq("purchase" -> (col("event_type") === "purchase")),
      pre = Seq("signup" -> (col("event_type") === "signup")))
    assert(rows(dsl) == rows(direct))
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_group_range_reluctant_pre")(spark, sf)))
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN (signup (click view){1,2}? purchase)
        |DEFINE click AS event_type = 'click',
        |       view AS event_type = 'view',
        |       signup AS event_type = 'signup',
        |       purchase AS event_type = 'purchase'
        |WITHIN INTERVAL '1440' MINUTE""".stripMargin)
    val bounded = CepOps.cepGroupRangeReluctant(ev, "user_id", "ts",
      "event_id", grp, n = 1, m = 2, within = "1440 minutes",
      post = Seq("purchase" -> (col("event_type") === "purchase")),
      pre = Seq("signup" -> (col("event_type") === "signup")),
      matchWithinUs = Some(1440L * 60000000L))
    assert(rows(mr.select(dsl.columns.map(col): _*)) == rows(bounded),
      "MATCH_RECOGNIZE must equal the kernel with the bound INSIDE")
    // anchor identity: ONE reps value per (key, signup_id) — per-match
    // laziness, not per-group-entry (which would partition on click_1)
    assert(dsl.groupBy("user_id", "signup_id")
      .agg(countDistinct(col("reps")).as("n"))
      .filter(col("n") > 1).count() == 0,
      "an anchor (= the pre.head event) must carry exactly one count")
  }

  test("whole-match WITHIN prunes BEFORE the per-anchor pick (greedy MR face)") {
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    // per-step band 60 min, whole-match WITHIN 80 min. Anchor click@0:
    //  - 1-rep completion: view@10, signup@40 -> total 40 (in bound)
    //  - 2-rep completion: view@10, click@35, view@45, signup@100 ->
    //    total 100 (BUSTS the bound; signup@40 cannot close the 2-rep,
    //    it precedes view@45)
    // Greedy must fall through to the in-bound 1-rep match. Applying
    // the bound AFTER the argmax would pick reps=2 first and then drop
    // the anchor entirely — the divergence ADVICE r16 flagged. (The
    // argMIN face cannot diverge under uniform bands: an in-bound
    // longer completion always implies an in-bound shorter one for the
    // same anchor — its tail events re-anchor as the shorter chain —
    // so the greedy face is where the pre-argmin bound is observable.)
    val df = Seq(
      (1L, t(0), 1L, "click"), (1L, t(10), 2L, "view"),
      (1L, t(35), 3L, "click"), (1L, t(45), 4L, "view"),
      (1L, t(40), 5L, "signup"), (1L, t(100), 6L, "signup"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val mr = MatchRecognize(df, "user_id", "ts", "event_id",
      """PATTERN ((click view){1,2} signup)
        |DEFINE click AS event_type = 'click',
        |       view AS event_type = 'view',
        |       signup AS event_type = 'signup'
        |WITHIN INTERVAL '80' MINUTE""".stripMargin)
    val got = mr.select("click_1_id", "reps", "signup_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got.contains((1L, 1, 5L)),
      s"anchor click@0 must fall through to its in-bound 1-rep match, " +
        s"got $got")
    assert(!got.exists(_._2 == 2),
      s"every 2-rep completion busts the 80-min bound, got $got")
    // and the same compile WITHOUT the tight bound picks reps=2
    val loose = MatchRecognize(df, "user_id", "ts", "event_id",
      """PATTERN ((click view){1,2} signup)
        |DEFINE click AS event_type = 'click',
        |       view AS event_type = 'view',
        |       signup AS event_type = 'signup'
        |WITHIN INTERVAL '300' MINUTE""".stripMargin)
      .select("click_1_id", "reps", "signup_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(loose.contains((1L, 2, 6L)),
      s"with a loose bound the same anchor must stretch to 2 reps, " +
        s"got $loose")
  }

  test("A{n,m}? post CHAIN: a count qualifies only when the whole chain completes") {
    val sp = spark
    import sp.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // clicks at 0,5,10; purchase@12 then view@14 (chain for the 2-run
    // anchored@0 via tail@5: p in (5,17], v in (12,24] — completes);
    // second purchase@20 has NO view within its band reachable for the
    // 3-run... fixture: anchor@0 2-run completes the full chain ->
    // reps=2; anchor@5 (2-run tail@10, p@12, v@14) -> reps=2.
    val df = Seq((1L, t(0), 1L, "click"), (1L, t(5), 2L, "click"),
      (1L, t(10), 3L, "click"), (1L, t(12), 7L, "purchase"),
      (1L, t(14), 8L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = CepOps.cepTimesRangeReluctant(df, "user_id", "ts",
        "event_id", col("event_type") === "click", n = 2, m = 3,
        within = "12 minutes",
        post = Seq("purchase" -> (col("event_type") === "purchase"),
          "view" -> (col("event_type") === "view")))
    assert(out.columns.toSeq == Seq("user_id", "first_id", "last_id",
      "purchase_id", "view_id", "reps", "span_us"))
    val got = out.collect().map(r => (r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getInt(5))).toSet
    assert(got == Set((1L, 2L, 7L, 8L, 2), (2L, 3L, 7L, 8L, 2)),
      s"both anchors complete the chain at their minimal count, got $got")
    // drop the view and the SAME pattern yields nothing: the purchase
    // alone no longer closes a chain that requires purchase THEN view
    val noView = df.filter(col("event_id") =!= 8L)
    assert(CepOps.cepTimesRangeReluctant(noView, "user_id", "ts",
      "event_id", col("event_type") === "click", n = 2, m = 3,
      within = "12 minutes",
      post = Seq("purchase" -> (col("event_type") === "purchase"),
        "view" -> (col("event_type") === "view"))).count() == 0)
    // DSL face parity on the sf fixture + the key
    val dsl = Pattern.begin("click", col("event_type") === "click")
      .times(2, 3).consecutive().within("12 hours")
      .reluctantlyFollowedBy("purchase", col("event_type") === "purchase")
      .followedBy("view", col("event_type") === "view")
      .over(ev, "user_id", "ts", "event_id")
    assert(rows(dsl) == rows(
      graft.SparkEntry.queries("cep_times_range_chain")(spark, sf)))
    val mr = MatchRecognize(ev, "user_id", "ts", "event_id",
      """PATTERN (click{2,3}? purchase view)
        |DEFINE click AS event_type = 'click',
        |       purchase AS event_type = 'purchase',
        |       view AS event_type = 'view'
        |WITHIN INTERVAL '12' HOUR""".stripMargin)
    assert(rows(mr) == rows(dsl))
  }
}
