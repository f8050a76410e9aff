package graft.operators

import graft.SparkSpec

/** Closed-form checks for the r3 text/graph additions: integer
  * PageRank, char entropy, redaction, held-out LM scoring. */
class TextGraphOpsSpec extends SparkSpec {

  import org.apache.spark.sql.functions.col

  test("pagerank on a 3-cycle is the exact integer fixed point") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = GraphOps.pagerank(edges, iters = 3).orderBy("node")
      .as[(String, Long)].collect().toSeq
    // r0 = 1e12/3; each iteration returns the same value:
    // 150000000000/3 + ((r/1)*85)/100 = 50000000000 + 283333333333
    assert(got == Seq(("a", 333333333333L), ("b", 333333333333L),
      ("c", 333333333333L)))
  }

  test("pagerank concentrates rank on the sink-hub of a star") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("c", "b"), ("b", "a"), ("b", "c"))
      .toDF("src", "dst")
    val r = GraphOps.pagerank(edges, iters = 5).orderBy("node")
      .as[(String, Long)].collect().toMap
    assert(r("b") > r("a") && r("a") == r("c"))
  }

  test("charEntropy: uniform text scores ln(k), constant text scores 0") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "ab")).toDF("doc_id", "text")
    val got = TextOps.charEntropy(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // "aaaa": ln4 - 4·ln4/4 = 0;  "ab": ln2 = 0.6931471... → 693147
    assert(got == Seq((1L, 4L, 1L, 0L), (2L, 2L, 2L, 693147L)))
  }

  test("redact masks every match and counts them") {
    import spark.implicits._
    val df = Seq((1L, "a1b22"), (2L, "none")).toDF("id", "s")
    val got = TextOps.redact(df, "id", "s", "[0-9]", "#").orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "a#b##", 3), (2L, "none", 0)))
  }

  test("lmScoreHeldOut scores unseen bigrams by smoothing, seen by train counts") {
    import spark.implicits._
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val test = Seq((10L, "a b"), (11L, "x y")).toDF("doc_id", "text")
    val got = TextOps.lmScoreHeldOut(train, test).orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // train bigrams: (a,b)x2, (b,a)x1 → c2(a,b)=2, c1(a)=2, V=2
    // doc 10: ln((2+1)/(2+2)) = ln 0.75 → round(-0.287682, 6/4)
    // doc 11: ln((0+1)/(0+2)) = ln 0.5  → -0.693147 → -0.6931
    assert(got == Seq((10L, 1L, -0.2877), (11L, 1L, -0.6931)))
  }

  test("bpeApply merges in rank order: full-word merges collapse to one unit") {
    import spark.implicits._
    val merges = Seq("e r" -> "er", "o r" -> "or", "t h" -> "th",
      "th e" -> "the", "s t" -> "st", "o r d" -> "_", // never matches post-merge
      "or d" -> "ord", "ord er" -> "order", "k e y" -> "key")
    val docs = Seq((1L, "the order key stream x")).toDF("doc_id", "text")
    val got = TextOps.bpeApply(docs, merges)
      .as[(Long, String, Int)].collect().map(t => t._2 -> t._3).toMap
    // the: t h→th, th e→the → 1 unit; order: e r→er, o r→or, or d→ord,
    // ord er→order → 1; key: k e y→key → 1; stream: 6 symbols, only
    // s t fires → 5; x: single symbol → 1
    assert(got == Map("the" -> 1, "order" -> 1, "key" -> 1,
      "stream" -> 5, "x" -> 1))
  }

  test("triangleStats counts K4 as 4 triangles and ignores self-loops/dups") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("a", "a")).toDF("src", "dst")
    val r = GraphOps.triangleStats(edges).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 6L, 4L)))
  }

  test("degree-oriented triangle count equals the canonical closure") {
    import spark.implicits._
    // K4 plus a pendant chain and a detached triangle — mixed degrees
    // so the orientation actually reorders edges
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("d", "e"), ("e", "f"), ("x", "y"), ("y", "z"), ("z", "x"))
      .toDF("src", "dst")
    val o = GraphOps.triangleStats(edges).collect().head
    val c = GraphOps.triangleStatsCanonical(edges).collect().head
    assert(o.toSeq == c.toSeq && o.getLong(2) == 5L)
    // and on the real word-bigram fixture graph (mixed real degrees)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val fixtureEdges = TextOps.bigrams(docs.select(col("doc_id"), col("text")))
      .select(col("w1").as("src"), col("w2").as("dst")).distinct()
    assert(GraphOps.triangleStats(fixtureEdges).collect().head.toSeq ==
      GraphOps.triangleStatsCanonical(fixtureEdges).collect().head.toSeq)
  }
}
