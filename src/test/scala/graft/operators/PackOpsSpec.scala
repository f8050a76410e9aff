package graft.operators

import graft.SparkSpec

/** Closed-form checks for chunking, packing, and the repetition
  * filter. */
class PackOpsSpec extends SparkSpec {

  test("chunk windows overlap and the tail may be short") {
    import spark.implicits._
    // 10 tokens, size 4, overlap 1 → stride 3 → starts 0,3,6 wait:
    // nc = (10-4+2) div 3 + 1 = 3 → starts 0,3,6; last = t7..t10 (4 toks)
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = PackOps.chunk(df, size = 4, overlap = 1)
      .orderBy("chunk_id")
      .select("chunk_id", "n_tok", "chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (0, 4, "w1 w2 w3 w4"),
      (1, 4, "w4 w5 w6 w7"),
      (2, 4, "w7 w8 w9 w10")))
  }

  test("chunk: doc shorter than the window is one whole chunk") {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val got = PackOps.chunk(df, size = 16, overlap = 4)
      .select("chunk_id", "n_tok", "chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(got == Seq((0, 2, "a b")))
  }

  test("chunk windows reconstruct the doc (every token covered, in order)") {
    import spark.implicits._
    val text = (1 to 57).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = PackOps.chunk(df, size = 16, overlap = 4)
      .orderBy("chunk_id").as[(Long, Int, Int, String)].collect()
    // stride 12: dropping the 4-token overlap from every chunk but the
    // first re-concatenates to the original document
    val rebuilt = chunks.head._4 +: chunks.tail.map(
      c => c._4.split(" ").drop(4).mkString(" "))
    assert(rebuilt.filter(_.nonEmpty).mkString(" ") == text)
  }

  test("packBins bins by cumulative budget within a stratum") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 30L), ("a", 2L, 30L), ("a", 3L, 30L), ("a", 4L, 30L),
      ("b", 5L, 100L), ("b", 6L, 10L)).toDF("source", "doc_id", "n_tok")
    val got = PackOps.packBins(df, budget = 64).orderBy("doc_id")
      .select("doc_id", "cum_before", "bin")
      .as[(Long, Long, Long)].collect().toSeq
    // a: cum 0,30,60,90 → bins 0,0,0,1 ; b: cum 0,100 → bins 0,1
    assert(got == Seq((1L, 0L, 0L), (2L, 30L, 0L), (3L, 60L, 0L),
      (4L, 90L, 1L), (5L, 0L, 0L), (6L, 100L, 1L)))
  }

  test("repetitionFilter flags repeated bigrams and short docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam"), // all bigrams identical
      (2L, "one two three four five six"),   // all distinct
      (3L, "too short")                      // n_tok < 5
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionFilter(df).orderBy("doc_id")
      .select("doc_id", "n_tok", "dup_bigram_u", "keep")
      .as[(Long, Int, Long, Boolean)].collect().toSeq
    // doc1: 5 bigrams, 1 distinct → 1 - 1/5 = 0.8 → 800000 → drop
    assert(got == Seq((1L, 6, 800000L, false), (2L, 6, 0L, true),
      (3L, 2, 0L, false)))
  }
}
