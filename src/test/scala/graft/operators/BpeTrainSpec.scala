package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** [[TextOps.bpeTrain]] against an independent in-memory reference of
  * the classic BPE training loop (word-frequency table, weighted
  * adjacent-pair counts, argmax with (support DESC, left, right)
  * tie-break, leftmost-first non-overlapping rewrite, `</w>` marker),
  * plus determinism and small hand-checked corpora. */
class BpeTrainSpec extends SparkSpec {

  /** Plain-Scala reference: classic BPE on a word-count map. */
  private def reference(words: Map[String, Long], nMerges: Int,
      minSupport: Long = 2L): Seq[(Int, String, String, String, Long)] = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, c) => (w.split("").filter(_.nonEmpty).toList :+ "</w>") -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), support) = counts.toSeq
          .sortBy { case ((a, b), s) => (-s, a, b) }.head
        if (support < minSupport) done = true
        else {
          val m = l + r
          out += ((rank, l, r, m, support))
          vocab = vocab.toSeq.map { case (syms, c) =>
            val acc = scala.collection.mutable.ListBuffer.empty[String]
            syms.foreach { x =>
              if (acc.nonEmpty && acc.last == l && x == r)
                acc(acc.size - 1) = m
              else acc += x
            }
            acc.toList -> c
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
          rank += 1
        }
      }
    }
    out.toSeq
  }

  private def trained(df: org.apache.spark.sql.DataFrame, n: Int) =
    TextOps.bpeTrain(df, nMerges = n).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("hand corpus: merges follow classic BPE order with tie-breaks") {
    import spark.implicits._
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the textbook example
    val docs = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = docs.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = trained(df, 6)
    val want = reference(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 6)
    assert(got == want)
    // the first merge of the textbook corpus is (e, s) or (s, t) at 9;
    // tie-break is lexicographic on (left, right)
    assert(got.head._5 == 9L)
    assert((got.head._2, got.head._3) == ("e", "s"))
  }

  test("distributed trainer equals the reference on the fixture corpus") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    val words = df.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = trained(df, 8)
    assert(got == reference(words, 8))
    assert(got.size == 8) // fixture corpus has ≥8 viable merges
  }

  test("training is deterministic across repartitionings") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(trained(df, 4) == trained(df.repartition(7), 4))
  }

  test("encode(train(corpus)): each merge monotonically shrinks the encoding") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = trained(df, 6).map(m => (m._2, m._3))
    val totals = (0 to merges.size).map { k =>
      TextOps.bpeEncode(df, merges.take(k))
        .agg(sum("units")).collect()(0).getLong(0)
    }
    totals.sliding(2).foreach { case Seq(a, b) => assert(b < a); case _ => }
    // shrink is bounded by the summed supports (supports count sliding
    // pairs, which over-count self-overlapping runs vs the
    // non-overlapping fold — e.g. "aaa" has two (a,a) pairs, one merge)
    val supports = trained(df, 6).map(_._5).sum
    assert(totals.head - totals.last <= supports)
    assert(totals.head - totals.last >= supports / 2)
  }

  test("exact array encoding is immune to string-boundary aliasing") {
    import spark.implicits._
    // merge (a, b): the token "aab" contains the SUBSTRING "a b" in its
    // space-joined form "a a b </w>" twice-overlapping; exact fold must
    // merge only the true symbol pair
    val df = Seq((1L, "aab ab")).toDF("doc_id", "text")
    val got = TextOps.bpeEncode(df, Seq(("a", "b")))
      .collect().map(r => (r.getString(1), r.getInt(2))).toMap
    assert(got == Map("aab" -> 3, "ab" -> 2)) // a,ab,</w> and ab,</w>
  }
}
