package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** `agg_theta_setops` / `agg_topk_mergeable` accuracy gates: theta
  * set-operation estimates track the exact distinct counts, and the
  * combined top-k state reproduces the exact global heavy hitters
  * (maxItemsTracked far above the fixture's distinct-user count makes
  * the sketch exact there, so the gate is equality, not a band).
  */
class ThetaTopkSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("theta union/intersection/difference estimates within 5% of exact") {
    val ev = Tables.events(spark, sf)
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val (c, p) = (users("click"), users("purchase"))
    val est = graft.SparkEntry.queries("agg_theta_setops")(spark, sf).head()
    val (eu, ei, ed) = (est.getLong(0).toDouble, est.getLong(1).toDouble,
      est.getLong(2).toDouble)
    def ok(e: Double, exact: Int, what: String) = assert(
      math.abs(e - exact) <= math.max(1.0, 0.05 * exact),
      s"$what: estimate $e vs exact $exact")
    ok(eu, (c ++ p).size, "union")
    ok(ei, (c & p).size, "intersection")
    ok(ed, (c -- p).size, "difference")
  }

  test("theta retention matrix: every cell within 5% of exact pairwise overlap") {
    val uw = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 604800000000").as("wk"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWk = uw.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cells = graft.SparkEntry.queries("agg_theta_retention")(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val weeks = byWk.keySet.toSeq.sorted
    assert(cells.length == weeks.size * (weeks.size + 1) / 2,
      s"matrix must cover every wk_a <= wk_b pair, got ${cells.length}")
    cells.foreach { case ((a, b), est) =>
      val exact = (byWk(a) & byWk(b)).size
      assert(math.abs(est.toDouble - exact) <= math.max(1.0, 0.05 * exact),
        s"cell ($a,$b): estimate $est vs exact $exact")
    }
    // diagonal sanity: (w,w) is just that week's distinct count
    cells.filter { case ((a, b), _) => a == b }.foreach { case ((a, _), est) =>
      assert(math.abs(est.toDouble - byWk(a).size) <= math.max(1.0, 0.05 * byWk(a).size))
    }
  }

  test("per-window approx_top_k matches exact hourly counts and top-3 multiset") {
    val exact = Tables.events(spark, sf)
      .groupBy(expr("unix_micros(ts) - unix_micros(ts) % 3600000000").as("ws_us"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val byWin = exact.groupBy(_._1._1)
    val est = graft.SparkEntry.queries("stream_topk_window")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // every reported (window, user) carries its true count
    est.foreach { case (ws, uid, n, _) =>
      assert(exact((ws, uid)) == n, s"window $ws user $uid reported $n") }
    // per window, the reported count-multiset equals the exact top-3's
    est.groupBy(_._1).foreach { case (ws, rows) =>
      val want = byWin(ws).values.toSeq.sorted.reverse.take(3)
      assert(rows.map(_._3).toSeq.sorted.reverse == want,
        s"window $ws counts ${rows.map(_._3).toSeq} vs exact $want")
    }
    assert(est.nonEmpty)
  }

  test("windowed top-k sketch agg runs as a watermarked streaming query") {
    // same shape as the batch key, streamed: sketch agg states live in
    // the state store and merge across micro-batches
    import org.apache.spark.sql.functions.{window => twindow}
    val streamed = graft.streaming.BoundedReplay.replayEvents(
        spark, "/root/testdata/sf0.001", chunks = 4)(
        ev => ev.withWatermark("ts", "10 minutes")
          .groupBy(twindow(col("ts"), "1 hour").as("w"))
          .agg(expr("approx_top_k_estimate(approx_top_k_accumulate(user_id, 1024), 3)")
            .as("top"))
          .select(unix_micros(col("w.start")).as("ws_us"),
            posexplode(col("top")).as(Seq("rnk0", "t")))
          .select(col("ws_us"), col("t.item").as("user_id"),
            col("t.count").as("n"), (col("rnk0") + 1).cast("int").as("rnk")))(
        _ => spark.emptyDataFrame.selectExpr("CAST(0 AS LONG) AS ws_us",
          "CAST(0 AS LONG) AS user_id", "CAST(0 AS LONG) AS n",
          "CAST(0 AS INT) AS rnk").limit(0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val batch = graft.SparkEntry.queries("stream_topk_window")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // a bounded replay withholds windows past the final watermark; for
    // every emitted window the count-multiset must equal the batch
    // key's (item identity may differ only among TIED counts — sketch
    // top-k tie-breaking is unspecified) and each reported count must
    // be the item's true count in that window
    assert(streamed.nonEmpty, "replay must emit closed windows")
    val trueCounts = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(expr("unix_micros(ts) - unix_micros(ts) % 3600000000").as("ws_us"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    streamed.foreach { case (ws, uid, n, _) =>
      assert(trueCounts((ws, uid)) == n, s"window $ws user $uid reported $n") }
    val batchByWs = batch.groupBy(_._1)
    streamed.groupBy(_._1).foreach { case (ws, rows) =>
      assert(rows.map(_._3).toSeq.sorted == batchByWs(ws).map(_._3).toSeq.sorted,
        s"window $ws count multiset differs from batch")
    }
    val emittedWs = streamed.map(_._1)
    val batchWs = batch.map(_._1)
    assert(emittedWs.size >= batchWs.size / 2,
      "most windows should close during a 4-chunk replay")
  }

  test("combined approx_top_k equals the exact global top-5") {
    val exact = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(5).collect().map(r => (r.getLong(0), r.getLong(1)))
    val est = graft.SparkEntry.queries("agg_topk_mergeable")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // counts must match exactly (sketch is exact below maxItemsTracked);
    // item order can differ only among equal counts
    assert(est.map(_._2).toSeq.sorted == exact.map(_._2).toSeq.sorted,
      s"est ${est.toSeq} vs exact ${exact.toSeq}")
    val exactByCount = exact.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // every estimated item's true count equals its reported count
    val trueCounts = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    est.foreach { case (uid, n) =>
      assert(trueCounts(uid) == n, s"user $uid reported $n true ${trueCounts(uid)}")
    }
    assert(est.length == 5)
    // suppress unused warning path: exactByCount retained for debugging
    assert(exactByCount.values.map(_.size).sum == 5)
  }
}
