package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Seeded-random property tests for the r3 ops: chunking must cover
  * every token exactly (accounting for overlap), packing must respect
  * the bin budget's arithmetic, PageRank mass must stay bounded. */
class PackPropertySpec extends SparkSpec {

  test("chunk: random sizes/overlaps always cover the doc exactly, in order") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1 to 6) {
      val r = new Random(seed)
      val size = 2 + r.nextInt(20)
      val overlap = r.nextInt(size) // < size by construction
      val docs = (1L to 5L).map { id =>
        (id, (1 to (1 + r.nextInt(90))).map(i => s"d${id}t$i").mkString(" "))
      }
      val got = PackOps.chunk(docs.toDF("doc_id", "text"), size, overlap)
        .orderBy("doc_id", "chunk_id")
        .select("doc_id", "chunk_id", "chunk_text")
        .as[(Long, Int, String)].collect().toSeq
      docs.foreach { case (id, text) =>
        val chunks = got.filter(_._1 == id).sortBy(_._2).map(_._3)
        assert(chunks.nonEmpty, s"seed=$seed id=$id: no chunks")
        // every chunk except the last has exactly `size` tokens
        chunks.init.foreach(c => assert(c.split(" ").length == size,
          s"seed=$seed id=$id size=$size overlap=$overlap: interior chunk short"))
        // dropping the overlap from each successor rebuilds the doc
        val rebuilt = (chunks.head +: chunks.tail.map(
          _.split(" ").drop(overlap).mkString(" "))).filter(_.nonEmpty)
        assert(rebuilt.mkString(" ") == text,
          s"seed=$seed id=$id size=$size overlap=$overlap: coverage broken")
      }
    }
  }

  test("packBins: bins are contiguous and every bin start is below the budget boundary") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1 to 4) {
      val r = new Random(seed)
      val budget = 50L + r.nextInt(200)
      val rows = (1L to 40L).map(id =>
        (s"s${id % 3}", id, 1L + r.nextInt(60).toLong))
      val got = PackOps.packBins(rows.toDF("source", "doc_id", "n_tok"), budget)
        .select("source", "doc_id", "n_tok", "cum_before", "bin")
        .as[(String, Long, Long, Long, Long)].collect()
        .groupBy(_._1)
      got.foreach { case (_, docs) =>
        val ordered = docs.sortBy(_._2)
        // cum_before is the running sum of the earlier docs in the stratum
        var cum = 0L
        ordered.foreach { case (_, _, n, cumBefore, bin) =>
          assert(cumBefore == cum && bin == cum / budget)
          cum += n
        }
        // bins appear in nondecreasing order (contiguity)
        val bins = ordered.map(_._5)
        assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
      }
    }
  }

  test("pagerank: total mass stays within truncation loss of the ideal") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val n = 8
      // random graph where every node has at least one out-edge (no
      // dangling leakage — only integer truncation may lose mass)
      val edges = (0 until n).flatMap { s =>
        val outs = r.shuffle((0 until n).filter(_ != s).toList)
          .take(1 + r.nextInt(3))
        outs.map(d => (s"n$s", s"n$d"))
      }.distinct
      val scale = 1000000000000L
      val ranks = GraphOps.pagerank(edges.toDF("src", "dst"), iters = 4)
        .select("r").as[Long].collect()
      val total = ranks.sum
      // ideal mass = scale; each division truncates < 1 unit per
      // node/edge per iteration — allow a generous linear bound
      val slack = 4L * (n + edges.size + 100L)
      assert(total <= scale && total >= scale - slack * 100,
        s"seed=$seed total=$total")
      assert(ranks.forall(_ > 0))
    }
  }
}
