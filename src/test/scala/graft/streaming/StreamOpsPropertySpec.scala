package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.sql.Timestamp
import scala.util.Random

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** SURVEY §5.3-4 property tests. Every [[StreamOps]] transform is also a
  * valid batch transform (same LogicalPlan, batch execution), so each
  * property drives it with seeded random event sets and checks the
  * invariant against an in-memory Scala oracle. Seeded → deterministic.
  */
class StreamOpsPropertySpec extends SparkSpec {

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime // ms

  private def genEvents(seed: Int, n: Int): Seq[Ev] = {
    val r = new Random(seed)
    val types = Seq("click", "view", "purchase", "signup", "error")
    (0 until n).map { i =>
      Ev(i.toLong, new Timestamp(base + r.nextInt(6 * 3600 * 1000).toLong),
        r.nextInt(4).toLong, types(r.nextInt(types.size)),
        math.round(r.nextDouble() * 1000) / 10.0, "{}")
    }
  }

  private def df(evs: Seq[Ev]): DataFrame = {
    val sp = spark
    import sp.implicits._
    evs.toDF()
  }

  private val HourMs = 3600L * 1000L

  test("tumbling window partitions events: counts sum to input, starts hour-aligned") {
    for (seed <- 1 to 4) {
      val evs = genEvents(seed, 40 + seed * 7)
      val out = StreamOps.tumblingHour(df(evs))
        .collect().map(r => (r.getString(0), r.getLong(2)))
      assert(out.map(_._2).sum == evs.size, s"seed=$seed: every event in exactly one bucket")
      assert(out.forall(_._1.endsWith(":00:00")), s"seed=$seed: starts hour-aligned")
    }
  }

  test("sliding 1h/15m windows cover each event exactly 4 times") {
    for (seed <- 1 to 4) {
      val evs = genEvents(seed, 30 + seed * 5)
      val out = StreamOps.slidingQuarter(df(evs)).collect().map(_.getLong(1))
      assert(out.sum == 4L * evs.size, s"seed=$seed: size/slide = 4 assignments per event")
    }
  }

  test("session windows: counts sum to input; per-user starts separated by > gap") {
    for (seed <- 1 to 4) {
      val evs = genEvents(seed, 50)
      val out = StreamOps.sessionByUser(df(evs))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.map(_._3).sum == evs.size, s"seed=$seed: partition of events")
      out.groupBy(_._1).foreach { case (u, ss) =>
        val starts = ss.map(_._2).sorted.toSeq
        starts.sliding(2).foreach { w =>
          if (w.size == 2)
            assert(w(1) - w(0) >= 30L * 60 * 1000000,
              s"seed=$seed user=$u: starts ${w(0)},${w(1)} closer than the gap")
        }
      }
    }
  }

  test("dedup-first equals the in-memory (ts, event_id)-min oracle") {
    for (seed <- 1 to 4) {
      val evs = genEvents(seed, 45)
      val expected = evs.groupBy(_.user_id).map { case (u, es) =>
        val first = es.minBy(e => (e.ts.getTime, e.event_id))
        (u, first.event_id)
      }.toSet
      // batch dedup has no arrival order; use the deterministic batch twin
      val sp = spark
      import sp.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val got = df(evs).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "event_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed")
    }
  }

  test("forward-fill equals the in-memory hourly-carry oracle (minus tail hour)") {
    for (seed <- 1 to 4) {
      val evs = genEvents(seed, 35)
      // oracle: per user, hours [minHour, maxHour); value = latest event ≤ hour end
      val expected = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
        def hourUs(e: Ev) = (e.ts.getTime / HourMs) * HourMs * 1000
        val lo = hourUs(sorted.minBy(_.ts.getTime))
        val hi = hourUs(sorted.maxBy(_.ts.getTime))
        (lo until hi by HourMs * 1000).map { h =>
          val lastEv = sorted.takeWhile(e => hourUs(e) <= h).lastOption.get
          (u, h, lastEv.value)
        }
      }.toSet
      val got = StreamOps.forwardFill(df(evs))
        .collect().map(f => (f.user_id, f.h_us, f.v_fill)).toSet
      assert(got == expected, s"seed=$seed")
    }
  }

  test("CEP pairs equal the in-memory double-loop oracle") {
    for (seed <- 1 to 4) {
      val evs = genEvents(seed, 60)
      val expected = (for {
        a <- evs if a.event_type == "error"
        b <- evs
        if b.event_type == "purchase" && a.user_id == b.user_id
        gap = (b.ts.getTime - a.ts.getTime) * 1000
        if gap > 0 && gap <= 10L * 60 * 1000000
      } yield (a.user_id, a.event_id, b.event_id)).toSet
      val got = StreamOps.cepSequence(df(evs))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"seed=$seed")
    }
  }

  test("CUMULATE: final step equals the tumbling size-window; counts non-decreasing") {
    val SizeUs = 4L * 3600 * 1000000
    for (seed <- 1 to 3) {
      val evs = genEvents(seed, 60 + seed * 11)
      val rows = StreamOps.cumulate(df(evs))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // every event contributes to its own size-window's final step…
      val finals = rows.filter { case (ws, we, _) => we == ws + SizeUs }
      val tumbling = evs.groupBy(e => Math.floorDiv(e.ts.getTime * 1000, SizeUs) * SizeUs)
        .view.mapValues(_.size.toLong).toMap
      assert(finals.map(f => f._1 -> f._3).toMap == tumbling,
        s"seed=$seed: final cumulative step must equal the tumbling window count")
      // …and the expanding counts never shrink within a size-window
      rows.groupBy(_._1).foreach { case (ws, g) =>
        val ns = g.sortBy(_._2).map(_._3)
        assert(ns.zip(ns.tail).forall { case (a, b) => a <= b },
          s"seed=$seed ws=$ws: cumulative counts must be non-decreasing")
      }
    }
  }

  test("temporal join: exactly one output row per fact, version interval contains lookup") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("stream_temporal_join")(spark, sf)
    val nEvents = graft.Tables.events(spark, sf).count()
    assert(out.count() == nEvents, "left 1:<=1 join must preserve fact cardinality")
    val bad = out.filter(col("valid_from_us").isNotNull &&
      col("valid_from_us") > col("ts_us") - lit(3600000000L)).count()
    assert(bad == 0, "matched version must be valid at the lookup instant")
  }
}
