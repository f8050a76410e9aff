package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** [[DedupOps.canonicalizeUrl]] rule-by-rule and the
  * [[SampleOps.domainMixPlan]] integer-plan invariants. */
class UrlMixSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(DedupOps.canonicalizeUrl(col("url")))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalization: scheme, case, www, fragment, slash, params") {
    assert(canon("https://www.Ex.COM/a/") == Seq("ex.com/a"))
    assert(canon("HTTP://ex.com/a#frag") == Seq("ex.com/a"))
    assert(canon("http://ex.com/a?utm_source=x&ref=1") == Seq("ex.com/a"))
    // surviving params sort; tracking params drop from the middle
    assert(canon("http://ex.com/a?b=2&utm_campaign=c&a=1") ==
      Seq("ex.com/a?a=1&b=2"))
    // bare host; no trailing garbage
    assert(canon("https://Ex.com") == Seq("ex.com"))
    assert(canon("https://ex.com/?utm_x=1") == Seq("ex.com"))
    // fbclid dropped, real id kept
    assert(canon("http://ex.com/p?fbclid=abc&id=9") == Seq("ex.com/p?id=9"))
    // a param NAMED utterly unlike tracking survives even if value has utm
    assert(canon("http://ex.com/p?q=utm_source") == Seq("ex.com/p?q=utm_source"))
  }

  test("equal canon forms collapse; distinct queries stay distinct") {
    assert(canon("https://www.Ex.com/a/?utm_source=f", "http://ex.com/a").distinct.size == 1)
    assert(canon("http://ex.com/a?id=1", "http://ex.com/a?id=2").distinct.size == 2)
  }

  test("domain mix plan: exact integer recomputation and budget conservation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = SampleOps.domainMixPlan(docs,
      wRaw = (regexp_extract(col("stratum"), "([0-9]+)", 1).cast("int") % 4) + 1)
      .collect()
    val strata = plan.length
    assert(strata > 1)
    val totalTok = plan.map(_.getAs[Long]("n_tok")).sum
    val wOf = (s: String) => ("""\d+""".r.findFirstIn(s).get.toLong % 4L) + 1L
    val wTot = plan.map(r => wOf(r.getAs[String]("source"))).sum
    plan.foreach { r =>
      val n = r.getAs[Long]("n_tok")
      val w = wOf(r.getAs[String]("source"))
      val num = BigInt(w) * totalTok
      val den = BigInt(wTot) * n
      assert(r.getAs[Long]("epochs") == (num / den).toLong)
      assert(r.getAs[Long]("frac_u") == (BigInt(1000000) * (num % den) / den).toLong)
      assert(r.getAs[Long]("share_u") == (BigInt(1000000) * n / totalTok).toLong)
      assert(r.getAs[Long]("weight_u") == 1000000L * w / wTot)
    }
    // plan conserves the token budget: Σ (epochs + frac) · n_tok ≈ T
    val planned = plan.map { r =>
      (r.getAs[Long]("epochs") + r.getAs[Long]("frac_u") / 1e6) *
        r.getAs[Long]("n_tok")
    }.sum
    assert(math.abs(planned - totalTok.toDouble) / totalTok < 1e-4)
  }
}
