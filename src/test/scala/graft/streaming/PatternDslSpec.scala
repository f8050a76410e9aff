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
}
