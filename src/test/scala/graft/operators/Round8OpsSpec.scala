package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic properties of the round-8 additions; the oracle keys pin
  * cross-engine parity, these pin the operator contracts. */
class Round8OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("prioritySample: without replacement, deterministic, weight-biased") {
    val sp = spark
    import sp.implicits._
    // 100 heavy rows (w=100) among 900 light (w=1)
    val df = (0L until 1000L)
      .map(id => (id, if (id % 10 == 0) 100L else 1L))
      .toDF("doc_id", "w")
    val s1 = SampleOps.prioritySample(df, n = 50, weightCol = col("w")).collect()
    val s2 = SampleOps.prioritySample(df, n = 50, weightCol = col("w")).collect()
    assert(s1.toSeq == s2.toSeq, "draw must be deterministic")
    assert(s1.length == 50)
    val ids = s1.map(_.getLong(0))
    assert(ids.distinct.length == 50, "without replacement")
    // heavy rows hold 100·100 of 101·100-ish total mass — expect the
    // sample to be dominated by them (>= 35 of 50 is ~8 sigma slack)
    val heavy = ids.count(_ % 10 == 0)
    assert(heavy >= 35, s"only $heavy/50 heavy rows sampled")
  }

  test("winsorize: rank-based bounds clamp exactly, interior untouched") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 100).map(v => (v.toLong, "g", v.toLong)).toDF("doc_id", "source", "v")
    val w = ProfileOps.winsorize(df, "v", "source", "doc_id").select("v", "v_w")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val lo = math.ceil(0.05 * 100).toLong // 6 under IEEE (5.000…01 rounds up)
    val hi = math.ceil(0.95 * 100).toLong // 95
    assert(w(1L) == lo && w(lo) == lo, s"low tail must clamp to $lo")
    assert(w(100L) == hi && w(hi) == hi, s"high tail must clamp to $hi")
    assert(w(50L) == 50L, "interior values pass through")
  }

  test("editSimilarityJoin: shared-token candidates verified by levenshtein") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "red widget"), (2L, "red gadget"), // share "red", dist 3
      (3L, "blue bolt"), (4L, "blu bolt"),    // share "bolt", dist 1
      (5L, "abc"), (6L, "abd")                // dist 1 but NO shared token
    ).toDF("doc_id", "text")
    val pairs = DedupOps.editSimilarityJoin(df, maxDist = 3)
      .select("ai", "bi", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 2)))
    assert(pairs.contains((3L, 4L, 1)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 6L),
      "no shared token ⇒ out of contract even within maxDist")
  }

  test("editJoinExact: PassJoin signatures find EVERY pair ≤ d (vs brute force)") {
    val sp = spark
    import sp.implicits._
    // synthetic corpus exercising substitutions, inserts, deletes and
    // shifted regions; base words over a 3-letter alphabet keep true
    // pairs plentiful
    val words = (0 until 300).map { i =>
      val base = Integer.toString(i % 81 + 81, 3).map(c => ('a' + (c - '0')).toChar)
      val s = i / 81 match {
        case 0 => base.mkString                  // original
        case 1 => base.drop(1).mkString          // delete front (shift)
        case 2 => base.mkString + "x"            // append
        case _ => (base.updated(1, 'z')).mkString // substitute
      }
      (i.toLong, s)
    } ++ Seq((900L, "a"), (901L, "ab"), (902L, "b"), (903L, "abca")) // short band
    val df = words.toDF("doc_id", "text")
    val fast = DedupOps.editJoinExact(df, maxDist = 2)
      .select("ai", "bi", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist", levenshtein(col("a.text"), col("b.text")))
      .filter(col("dist") <= 2)
      .select(col("a.doc_id"), col("b.doc_id"), col("dist")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fast.exists(p => p._1 == 900L || p._2 == 900L),
      "short-band pairs must be covered")
    assert(brute.nonEmpty, "fixture must contain true pairs")
    assert(fast == brute,
      s"missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
  }

  test("GROUPS frame emulation equals an independent peer-aggregate strategy") {
    import org.apache.spark.sql.expressions.Window
    val out = graft.SparkEntry.queries("window_groups_frame")(spark, sf)
    // third strategy (the oracle's): aggregate each peer group, ROWS
    // frame over the group table, fan back out to the rows
    val li = Tables.lineitem(spark, sf).filter(col("l_suppkey") < 10)
    val g = li.groupBy("l_suppkey", "l_shipdate")
      .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("s"))
      .withColumn("gi", row_number().over(
        Window.partitionBy("l_suppkey").orderBy("l_shipdate")))
    val w = g.withColumn("gsum",
      round(sum(col("s")).over(Window.partitionBy("l_suppkey")
        .orderBy("gi").rowsBetween(-1, 1)).cast("double"), 4))
      .select("l_suppkey", "l_shipdate", "gsum")
    val expected = li.join(w, Seq("l_suppkey", "l_shipdate"))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "gsum")
    assert(out.count() == expected.count())
    assert(out.except(expected).isEmpty && expected.except(out).isEmpty,
      "dense_rank+RANGE emulation must equal the peer-aggregate strategy")
  }

  test("groupSplit: whole groups per split, proportions near fractions") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 5000L).map(id => (id, s"grp${id % 500}"))
      .toDF("doc_id", "source")
    val out = SampleOps.groupSplit(df, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // leakage check: a group never straddles two splits
    val straddle = out.groupBy("source")
      .agg(countDistinct("split").as("d")).filter(col("d") > 1).count()
    assert(straddle == 0, "every group must land in exactly one split")
    // 500 Bernoulli(0.8) groups: 5-sigma band around 400
    val byLabel = out.select("source", "split").distinct()
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLabel("train") - 400L) <= 45,
      s"train groups ${byLabel("train")} far from 400")
    assert(byLabel.values.sum == 500L)
  }

  test("sessionIdsCapped: refines gap sessions; span never exceeds the cap") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val gap = 1800000000L
    val cap = 10800000000L
    val capped = IntervalOps.sessionIdsCapped(ev, "user_id", "ts_us",
      "event_id", gap, cap)
    val plain = IntervalOps.sessionIds(ev, Seq("user_id"), "ts_us",
      "event_id", gap).select("user_id", "event_id", "session_id")
    // cap bound: no capped session spans more than capUs
    val spans = capped.join(ev, Seq("user_id", "event_id"))
      .groupBy("user_id", "session_id")
      .agg((max("ts_us") - min("ts_us")).as("span"))
    assert(spans.filter(col("span") > cap).count() == 0, "cap violated")
    // refinement: the capped assignment has at least as many sessions,
    // and two events in one capped session are always in one plain session
    val joined = capped.withColumnRenamed("session_id", "c")
      .join(plain.withColumnRenamed("session_id", "p"), Seq("user_id", "event_id"))
    val coarser = joined.groupBy("user_id", "c")
      .agg(countDistinct("p").as("np")).filter(col("np") > 1).count()
    assert(coarser == 0, "a capped session must sit inside one gap session")
    assert(capped.groupBy("user_id").agg(max("session_id")).collect().map(_.getInt(1)).sum >=
      plain.groupBy("user_id").agg(max("session_id")).collect().map(_.getInt(1)).sum)
  }

  test("sessionIdsCappedStream: bounded replay equals the batch fold") {
    import graft.streaming.{BoundedReplay, SessCapRow, StreamOps}
    val sp = spark
    import sp.implicits._
    val streamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.sessionIdsCappedStream(ev, "user_id", "ts", "event_id",
        gapUs = 1800000000L, capUs = 10800000000L).toDF())(
      _ => sp.emptyDataset[SessCapRow])
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val batch = IntervalOps.sessionIdsCapped(ev, "user_id", "ts_us",
      "event_id", 1800000000L, 10800000000L)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("user_id", "event_id", "session_id").collect()
        .map(_.toSeq.mkString("|")).sorted.toSeq
    val b = rows(batch.toDF())
    assert(b.nonEmpty)
    assert(rows(streamed) == b, "replayed automaton must equal the batch fold")
  }

  test("gapFillHourlyStream: replay ∪ flush equals the batch grid, zeros included") {
    import graft.streaming.{BoundedReplay, GapRow, StateFlush, StreamOps}
    val sp = spark
    import sp.implicits._
    val hourUs = 3600L * 1000000L
    val b = Tables.events(spark, sf)
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val loUs = b.getLong(0) / hourUs * hourUs
    val hiUs = b.getLong(1) / hourUs * hourUs + hourUs
    val streamed = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.gapFillHourlyStream(ev, loUs).toDF())(
      ckpt => StateFlush.gapFill(spark, ckpt, hiUs))
    val batch = graft.operators.IntervalOps.gapFillHourly(
        Tables.events(spark, sf), "ts", "event_type", "value")
      .select(unix_micros(col("ws")).as("ws_us"), col("event_type"),
        col("n"), col("sum_value"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val bt = rows(batch)
    assert(bt.exists(_.split("\\|")(2) == "0"), "fixture must have empty hours")
    assert(rows(streamed.select("ws_us", "event_type", "n", "sum_value")) == bt)
  }

  test("gapFillHourly: grid complete, zero rows for empty buckets, mass preserved") {
    val out = IntervalOps.gapFillHourly(Tables.events(spark, sf),
      "ts", "event_type", "value")
    val hours = out.select("ws").distinct().count()
    val types = out.select("event_type").distinct().count()
    assert(out.count() == hours * types, "grid must be complete")
    val n = out.agg(sum("n")).head().getLong(0)
    assert(n == Tables.events(spark, sf).count(), "event mass preserved")
    assert(out.filter(col("n") === 0 && col("sum_value") =!= 0.0).count() == 0)
  }

  test("CountMin: never underestimates, error-bounded, merge == direct") {
    import graft.functions.SketchAggregators
    import graft.functions.SketchAggregators.CountMin
    val sp = spark
    import sp.implicits._
    val depth = 4
    val width = 256
    // skewed multiset: key k appears k+1 times, 200 keys, N = 20100
    val rows = (0L until 200L).flatMap(k => Seq.fill(k.toInt + 1)(k))
    val df = rows.map(k => (if (k % 2 == 0) "a" else "b", k)).toDF("g", "k")
    val cms = new SketchAggregators.CountMin(depth, width)
    val per = df.as[(String, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(cms.toColumn.name("sk")).toDF("g", "sk")
    val merged = per.select(posexplode(col("sk")).as(Seq("pos", "cnt")))
      .groupBy("pos").agg(sum("cnt").as("cnt"))
      .collect().sortBy(_.getInt(0)).map(_.getLong(1)).toIndexedSeq
    val direct = df.select("k").as[Long].select(cms.toColumn.name("sk"))
      .head().toIndexedSeq
    assert(merged == direct, "per-group merge must equal the single-pass sketch")
    val n = rows.length
    val eps = math.E / width
    for (k <- 0L until 200L) {
      val exact = k + 1
      val est = CountMin.estimate(merged, depth, width, k)
      assert(est >= exact, s"CMS underestimated key $k: $est < $exact")
      assert(est <= exact + (3 * eps * n).toLong,
        s"key $k estimate $est beyond 3x eps*N bound over $exact")
    }
  }

  test("cdcChunks: boundaries are content-anchored — head insertion leaves the tail chunks identical") {
    val sp = spark
    import sp.implicits._
    // unique tokens => unique chunk contents => set comparisons are exact
    val base = (0 until 60).map(i => s"w$i")
    val df = Seq(
      (1L, base.mkString(" ")),
      (2L, ("zzz" +: base).mkString(" "))).toDF("doc_id", "text")
    val ch = TextOps.cdcChunks(df)
      .select("doc_id", "chunk_hash").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSeq }
    val h1 = ch(1L)
    val h2 = ch(2L)
    assert(h1.size >= 3, s"doc should split into several chunks, got ${h1.size}")
    // every chunk after the perturbed head must survive the insertion
    val shared = h1.toSet.intersect(h2.toSet).size
    assert(shared >= h1.size - 2,
      s"only $shared of ${h1.size} chunks survived a head insertion")
    // the position-based chunker has no such stability: same perturbation,
    // (almost) no chunk of doc1 reappears verbatim in doc2
    val fixed = PackOps.chunk(df, size = 16, overlap = 4)
      .select("doc_id", "chunk_text").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    val fixedShared = fixed(1L).intersect(fixed(2L)).size
    assert(fixedShared < shared,
      "content-defined chunking must beat position-based chunking under shifts")
  }

  test("madOutliers: robust against the contamination that breaks z-scores") {
    val sp = spark
    import sp.implicits._
    // 99 values near 100, one wild point at 100000: MAD flags exactly
    // the wild point; a mean+3σ gate would be dragged by it
    val df = ((1L to 99L).map(i => (i, "g", 100L + (i % 5))) :+ (999L, "g", 100000L))
      .toDF("doc_id", "source", "v")
    val out = ProfileOps.madOutliers(df, "v", "source", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(999L), s"expected only the wild point, got $out")
  }

  test("llm_topk_similar: ranks are 1..k, neighbors deduplicated, scores symmetric") {
    val out = graft.SparkEntry.queries("llm_topk_similar")(spark, sf)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_._1)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length).toSeq, s"ranks of $q")
      assert(rs.map(_._2).distinct.length == rs.length, s"dup neighbor for $q")
    }
    // symmetry: jac(q, n) == jac(n, q) whenever both directions surface
    val score = rows.map(r => (r._1, r._2) -> r._3).toMap
    score.foreach { case ((q, n), j) =>
      score.get((n, q)).foreach(j2 => assert(j2 == j, s"asymmetric $q-$n"))
    }
  }

  test("containmentPairs: catches a short doc quoted in a long one that Jaccard misses") {
    val sp = spark
    import sp.implicits._
    val quote = (1 to 10).map(i => s"q$i").mkString(" ")
    val long = ((1 to 60).map(i => s"w$i") :+ quote).mkString(" ")
    val df = Seq((1L, quote), (2L, long), (3L, (100 to 140).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cont = DedupOps.containmentPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val pair = cont.find(p => p._1 == 1L && p._2 == 2L)
    assert(pair.isDefined, "quoted pair must be a candidate")
    assert(pair.get._3 >= 0.99, s"short side containment ~1, got ${pair.get._3}")
    assert(pair.get._4 < 0.25, "long side containment stays small")
    val jac = DedupOps.jaccardPairs(df).filter(col("ai") === 1 && col("bi") === 2)
      .head().getDouble(2)
    assert(jac < 0.25, s"Jaccard blurs the inclusion, got $jac")
  }

  test("tumbling offset: every window start sits on the :15 grid") {
    val ws = graft.SparkEntry.queries("stream_tumbling_offset")(spark, sf)
      .select(minute(col("ws").cast("timestamp")).as("m")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(ws == Set(15), s"window starts must align to :15, got $ws")
  }
}
