package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the r3 additions: interval merging, SCD2 build,
  * bloom-prefiltered semi-join, and exact stratified sampling. */
class IntervalScd2BloomSpec extends SparkSpec {

  test("mergeIntervals: nested, touching, and disjoint shapes") {
    import spark.implicits._
    // key 1: [0,10) ∪ nested [2,5) ∪ touching [10,15) → one island [0,15)
    //        then a gap, [20,25) alone
    // key 2: identical triple overlap collapses to one island
    val iv = Seq(
      (1L, 0L, 10L), (1L, 2L, 5L), (1L, 10L, 15L), (1L, 20L, 25L),
      (2L, 0L, 3L), (2L, 0L, 3L), (2L, 1L, 2L)
    ).toDF("k", "s", "e")
    val got = IntervalOps.mergeIntervals(iv, Seq("k"), "s", "e")
      .orderBy("k", "ivl_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 0L, 15L, 3L), (1L, 20L, 25L, 1L),
      (2L, 0L, 3L, 3L)))
  }

  test("mergeIntervals: islands are disjoint and preserve row count") {
    import spark.implicits._
    // deterministic pseudo-random intervals over 3 keys
    val rows = (0 until 300).map { i =>
      val k = i % 3L
      val s = (i * 2654435761L % 997L)
      (k, s, s + 1 + (i * 40503L % 53L))
    }
    val iv = rows.toDF("k", "s", "e")
    val merged = IntervalOps.mergeIntervals(iv, Seq("k"), "s", "e")
      .orderBy("k", "ivl_start").collect()
    assert(merged.map(_.getLong(3)).sum == 300)
    merged.groupBy(_.getLong(0)).foreach { case (_, g) =>
      g.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) < b.getLong(1),
          s"islands overlap/touch: $a $b") // strictly before next start
        case _ =>
      }
    }
  }

  test("mergeIntervals equals a brute-force scanline on random inputs") {
    import spark.implicits._
    // seeded pseudo-random cases: heavy duplicates, zero-length-ish and
    // wide intervals, many keys
    for (seed <- Seq(7L, 101L, 9999L)) {
      val rows = (0 until 400).map { i =>
        val k = (i * 2654435761L + seed) % 5
        val s = (i * 40503L + seed * 31) % 300
        val len = 1 + (i * 69069L + seed) % 40
        (k, s, s + len)
      }
      val got = IntervalOps.mergeIntervals(rows.toDF("k", "s", "e"),
          Seq("k"), "s", "e")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      // reference: per-key sort + linear scanline fold
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
        val sorted = g.map(t => (t._2, t._3)).sortBy(identity)
        val islands = sorted.tail.foldLeft(
          List((sorted.head._1, sorted.head._2, 1L))) {
          case ((s0, e0, n) :: rest, (s, e)) =>
            if (s <= e0) (s0, math.max(e0, e), n + 1) :: rest
            else (s, e, 1L) :: (s0, e0, n) :: rest
          case (Nil, _) => Nil
        }.reverse
        islands.map { case (s, e, n) => (k, s, e, n) }
      }.sortBy(t => (t._1, t._2))
      assert(got == want, s"seed $seed")
    }
  }

  test("scd2: collapses runs, chains validity, flags only the last row") {
    import spark.implicits._
    val ev = Seq(
      // user 7: a a b b a  → versions a@0, b@20, a@40
      (7L, 0L, 1L, "a"), (7L, 10L, 2L, "a"), (7L, 20L, 3L, "b"),
      (7L, 30L, 4L, "b"), (7L, 40L, 5L, "a"),
      // user 8: single event
      (8L, 5L, 6L, "x")
    ).toDF("user_id", "ts_us", "event_id", "state")
    val got = DiffOps.scd2(ev, Seq("user_id"), Seq("ts_us", "event_id"),
        attrCol = "state", tsCol = "ts_us")
      .orderBy("user_id", "version").collect()
    val u7 = got.filter(_.getLong(0) == 7L)
    assert(u7.map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq((1, "a", 0L), (2, "b", 20L), (3, "a", 40L)))
    // validity chains: valid_to(i) == valid_from(i+1); only last is current
    u7.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) == b.getLong(3)); assert(!a.getBoolean(5))
    case _ => }
    assert(u7.last.isNullAt(4) && u7.last.getBoolean(5))
    assert(got.filter(_.getLong(0) == 8L).map(_.getBoolean(5)).toSeq == Seq(true))
  }

  test("bloomSemiJoin equals plain semi-join even at absurd fpp") {
    import spark.implicits._
    val fact = (0L until 2000L).map(i => (i, i % 97L)).toDF("id", "fk")
    val dim = (0L until 97L by 5L).toDF("dk")
    val plain = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .select("id").as[Long].collect().sorted
    // fpp 0.5: roughly half the non-members pass the bloom — the exact
    // join must still scrub every one of them
    val got = JoinOps.bloomSemiJoin(fact, dim, "fk", "dk",
        expectedItems = 100L, fpp = 0.5)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == plain.toSeq)
  }

  test("stratifiedSample: exactly min(n, stratum size) per stratum, stable under reshard") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val small = Seq((9999L, "tiny")).toDF("doc_id", "source")
    val in = df.union(small)
    val got = SampleOps.stratifiedSample(in, n = 30)
    val sizes = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("src0" -> 30L, "src1" -> 30L, "src2" -> 30L,
      "src3" -> 30L, "tiny" -> 1L))
    val again = SampleOps.stratifiedSample(in.repartition(13), n = 30)
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }
}
