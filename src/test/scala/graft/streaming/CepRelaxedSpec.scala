package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relaxed-contiguity bounded Kleene ([[CepOps.cepKleeneRelaxed]] —
  * Flink's default `A followedBy B+ followedBy C`):
  *  - pinned against an in-memory brute-force reference (per anchor,
  *    walk the B substream, close each prefix with the first later C)
  *    on a hand-built fixture exercising C-inside-run forks, broken
  *    runs, ties, transparent events, and the within bound;
  *  - every greedy [[CepOps.cepKleene]] match must reappear (subset
  *    relation) when the prefix cap covers the run length;
  *  - the `maxPrefix` cap truncates deterministically (smallest
  *    prefixes first).
  */
class CepRelaxedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq)

  /** (key, ts_us, id, cls) events — cls classification precedence is
    * applied by the caller, mirroring the operator's A>B>C rule. */
  private def bruteForce(ev: Seq[(Long, Long, Long, String)], withinUs: Long,
      maxPrefix: Int): Set[Seq[Any]] =
    ev.groupBy(_._1).flatMap { case (k, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.zipWithIndex.filter(_._1._4 == "A").flatMap { case (a, ai) =>
        val after = sorted.drop(ai + 1)
        val bs = after.filter(_._4 == "B")
        (1 to math.min(maxPrefix, bs.length)).flatMap { l =>
          val lastB = bs(l - 1)
          val ord = Ordering.Tuple2[Long, Long]
          val c = sorted
            .filter(e => e._4 == "C" && ord.gt((e._2, e._3), (lastB._2, lastB._3)))
            .sortBy(e => (e._2, e._3)).headOption
          c.filter(_._2 <= a._2 + withinUs).map { cc =>
            Seq[Any](k, a._3, l.toLong, bs.head._3, lastB._3, cc._3,
              cc._2 - a._2)
          }
        }
      }
    }.toSet

  private val fixture: Seq[(Long, Long, Long, String)] = Seq(
    // key 1: A b1 b2 C1 b3 C2  — C inside the run forks: prefixes 1-2
    // close with C1, prefix 3 with C2
    (1L, 1000000L, 10L, "A"), (1L, 2000000L, 11L, "B"),
    (1L, 3000000L, 12L, "B"), (1L, 4000000L, 13L, "C"),
    (1L, 5000000L, 14L, "B"), (1L, 6000000L, 15L, "C"),
    // key 2: two anchors sharing a run (anchors never consumed); a
    // transparent X event is dropped before classification
    (2L, 1000000L, 20L, "A"), (2L, 1500000L, 21L, "A"),
    (2L, 2000000L, 22L, "B"), (2L, 3000000L, 23L, "B"),
    (2L, 4000000L, 24L, "C"),
    // key 3: C beyond within for the later prefix only
    (3L, 0L, 30L, "A"), (3L, 1000000L, 31L, "B"),
    (3L, 2000000L, 32L, "C"), (3L, 3000000L, 33L, "B"),
    (3L, 99000000L, 34L, "C"),
    // key 4: tie on ts — id breaks the order
    (4L, 1000000L, 40L, "A"), (4L, 2000000L, 41L, "B"),
    (4L, 2000000L, 42L, "C"),
    // key 5: no C at all — no matches
    (5L, 1000000L, 50L, "A"), (5L, 2000000L, 51L, "B"))

  private def fixtureDf: DataFrame = {
    import spark.implicits._
    fixture.toDF("k", "ts_us", "id", "cls")
      .select(col("k"), timestamp_micros(col("ts_us")).as("ts"), col("id"),
        col("cls"))
  }

  test("matches the brute-force reference on the hand-built fixture") {
    val withinUs = 10L * 1000000L
    val got = rows(CepOps.cepKleeneRelaxed(fixtureDf, "k", "ts", "id",
      col("cls") === "A", col("cls") === "B", col("cls") === "C",
      within = "10 seconds", maxPrefix = 5))
    val want = bruteForce(fixture, withinUs, maxPrefix = 5)
    assert(want.nonEmpty, "fixture must produce matches")
    assert(got == want)
    // the C-inside-run fork on key 1: prefix 1 and 2 close at C1 (13),
    // prefix 3 continues past it and closes at C2 (15)
    val k1 = got.filter(_.head == 1L)
    assert(k1.map(r => (r(2), r(5))) ==
      Set((1L, 13L), (2L, 13L), (3L, 15L)))
    // both key-2 anchors emit (starts are never consumed)
    assert(got.filter(_.head == 2L).map(_(1)) == Set(20L, 21L))
    // key 3: prefix 1 closes in-bound, prefix 2's first C is out of bound
    assert(got.filter(_.head == 3L).map(r => (r(2), r(5))) == Set((1L, 32L)))
    // key 4: tie broken by id — C at the same ts but larger id counts as after
    assert(got.filter(_.head == 4L) ==
      Set(Seq[Any](4L, 40L, 1L, 41L, 41L, 42L, 1000000L)))
    assert(!got.exists(_.head == 5L))
  }

  test("maxPrefix caps deterministically: smallest prefixes survive") {
    val capped = rows(CepOps.cepKleeneRelaxed(fixtureDf, "k", "ts", "id",
      col("cls") === "A", col("cls") === "B", col("cls") === "C",
      within = "10 seconds", maxPrefix = 1))
    val full = rows(CepOps.cepKleeneRelaxed(fixtureDf, "k", "ts", "id",
      col("cls") === "A", col("cls") === "B", col("cls") === "C",
      within = "10 seconds", maxPrefix = 5))
    assert(capped == full.filter(_(2) == 1L))
  }

  test("streamed replay equals the batch prefix grid with zero flush gap") {
    import spark.implicits._
    val withinUs = 360L * 60L * 1000000L
    val streamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.cepKleeneRelaxedStream(ev, "user_id", "ts", "event_id",
        col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase", withinUs = withinUs,
        maxPrefix = 3))(
      _ => spark.emptyDataset[KleeneMatch])
    val batch = CepOps.cepKleeneRelaxed(graft.Tables.events(spark, sf),
      "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", within = "360 minutes", maxPrefix = 3)
    val b = batch.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(b.nonEmpty, "fixture must contain relaxed matches")
    assert(streamed.toDF().collect().map(_.toSeq.mkString("|")).sorted.toSeq == b)
  }

  test("measures streamed replay equals the batch relaxed measures") {
    import spark.implicits._
    val withinUs = 360L * 60L * 1000000L
    val streamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.cepKleeneRelaxedMeasuresStream(ev, "user_id", "ts", "event_id",
        col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase", withinUs = withinUs,
        maxPrefix = 3, valueCol = col("value")))(
      _ => spark.emptyDataset[RelaxedMMatch])
    val batch = CepOps.cepKleeneRelaxedMeasures(graft.Tables.events(spark, sf),
      "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", within = "360 minutes", maxPrefix = 3,
      valueCol = col("value"))
    val b = batch.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(b.nonEmpty)
    assert(streamed.toDF().collect().map(_.toSeq.mkString("|")).sorted.toSeq == b)
    // the measure columns ride the SAME matches as the plain relaxed form
    val plain = CepOps.cepKleeneRelaxed(graft.Tables.events(spark, sf),
      "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", within = "360 minutes", maxPrefix = 3)
    assert(batch.drop("sum_b", "avg_b").collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
  }

  test("greedy strict-contiguity matches are a subset (testdata events)") {
    val ev = graft.Tables.events(spark, sf)
    val greedy = rows(CepOps.cepKleene(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", within = "360 minutes"))
    val relaxed = rows(CepOps.cepKleeneRelaxed(ev, "user_id", "ts", "event_id",
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase", within = "360 minutes",
      maxPrefix = 1000))
    assert(greedy.nonEmpty, "fixture must contain greedy matches")
    assert(greedy.subsetOf(relaxed),
      "every greedy maximal-run match must appear among relaxed prefixes")
    // the strict superset property (non-maximal prefixes also emit) is
    // pinned on the hand-built fixture above — at sf0.001 the single
    // greedy run has length 1, so the two sets may coincide here
    assert(relaxed.size >= greedy.size)
  }
}
