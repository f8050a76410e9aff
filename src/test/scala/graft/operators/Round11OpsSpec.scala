package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins for the round-11 additions: ANN index maintenance (the
  * streamed-append half of the lifecycle) — the assignment kernel is
  * bit-identical to the bulk builder, and append-maintenance equals a
  * from-scratch rebuild.
  */
class Round11OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, sf)

  test("ivfAssignSaved is bit-identical to the bulk builder's assignment") {
    val path = java.nio.file.Files.createTempDirectory("ivf-asg-spec").toString
    SimilarityOps.saveIvfIndex(emb, path, nCells = 8, iters = 2)
    val bulk = spark.read.parquet(s"$path/assigned")
      .select(col("vec_id"), col("cid").cast("long"), col("nrm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val kernel = SimilarityOps.ivfAssignSaved(emb, path)
      .select("vec_id", "cid", "nrm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(kernel == bulk,
      s"kernel/bulk disagree on ${(kernel -- bulk).size + (bulk -- kernel).size} rows")
  }

  test("append-maintenance equals a from-scratch rebuild (index AND serve output)") {
    val base = emb.filter(col("vec_id") < 30)
    val delta = emb.filter(col("vec_id") >= 30)
    // maintained: bulk-build on base, stream-assign + append the delta
    val maintained = java.nio.file.Files.createTempDirectory("ivf-maint").toString
    SimilarityOps.saveIvfIndex(base, maintained, nCells = 8, iters = 2)
    SimilarityOps.appendToIvfIndex(
      SimilarityOps.ivfAssignSaved(delta, maintained), maintained)
    // rebuilt: one-shot index over everything, trained on the SAME base
    val rebuilt = java.nio.file.Files.createTempDirectory("ivf-rebuild").toString
    SimilarityOps.saveIvfIndex(emb, rebuilt, nCells = 8, iters = 2,
      trainOn = Some(base))
    def assigned(p: String) = spark.read.parquet(s"$p/assigned")
      .select(col("vec_id"), col("cid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(assigned(maintained) == assigned(rebuilt),
      "appended index must equal the from-scratch build row for row")
    def serve(p: String) = SimilarityOps.knnIvfSaved(emb, p,
        isQuery = col("vec_id") < 5, nprobe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(serve(maintained) == serve(rebuilt),
      "serving the maintained index must be bit-identical to the rebuild")
  }

  test("stream_distinct_window_portable: per-window estimates track exact distinct counts") {
    val sfq = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("stream_distinct_window_portable")(spark, sfq)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, sfq)
      .select(expr("unix_micros(ts) - unix_micros(ts) % 86400000000").as("ws_us"),
        col("user_id"))
      .groupBy("ws_us").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet, "one sketch row per window")
    // k=256 bottom-k: EXACT below k distinct, ~1/√(k−1) ≈ 6% (3σ 20%) above
    rows.foreach { case (w, est) =>
      val n = exact(w).toDouble
      if (n < 256) assert(est == n, s"window $w must be exact below k: $est vs $n")
      else assert(math.abs(est - n) <= 0.20 * n,
        s"window $w: est $est vs exact $n drifts past 3 sigma")
    }
  }

  test("cosineNearDupsCelled: subset of the exact kernel, complete within cells") {
    val sfq = "/root/testdata/sf0.01"
    val e = Tables.embeddings(spark, sfq)
    val celled = SimilarityOps.cosineNearDupsCelled(e, minCosine = 0.45,
        nCells = 16, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val kernel = SimilarityOps.cosineNearDups(e, minCosine = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(celled.nonEmpty, "fixture must contain same-cell near-dups")
    assert(celled.keySet.subsetOf(kernel.keySet),
      s"celled may never invent pairs: ${celled.keySet -- kernel.keySet}")
    celled.foreach { case (p, c) =>
      assert(c == kernel(p), s"cos must match the kernel exactly on $p")
    }
    // completeness within cells: every kernel pair whose vectors share
    // a cell must be found
    val assigned = {
      val path = java.nio.file.Files.createTempDirectory("cell-cov").toString
      SimilarityOps.saveIvfIndex(e, path, nCells = 16, iters = 2)
      spark.read.parquet(s"$path/assigned")
        .select(col("vec_id"), col("cid").cast("long").as("cid"))
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    }
    val sameCell = kernel.keySet.filter { case (a, b) => assigned(a) == assigned(b) }
    assert(sameCell.subsetOf(celled.keySet),
      s"within-cell recall must be complete; missing=${sameCell -- celled.keySet}")
  }

  test("stream_hist_window_portable: per-window p50/p95 within one bin width of exact") {
    val sfq = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("stream_hist_window_portable")(spark, sfq)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.nonEmpty)
    val binW = 0.5859375
    // the histogram's contract is the CEIL-RANK (type-1) percentile:
    // the estimate is the upper edge of the bin containing the value
    // at rank ⌈p·n⌉, so v < est ≤ v + binW
    val byW = Tables.events(spark, sfq)
      .select(expr("unix_micros(ts) - unix_micros(ts) % 86400000000").as("ws_us"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (w, vs) => w -> vs.map(_._2).sorted }
    assert(rows.keySet == byW.keySet)
    def rankVal(vs: Array[Double], num: Int, den: Int): Double =
      vs((num * vs.length + den - 1) / den - 1) // value at rank ⌈p·n⌉
    rows.foreach { case (w, (p50, p95)) =>
      val (v50, v95) = (rankVal(byW(w).toArray, 1, 2), rankVal(byW(w).toArray, 95, 100))
      assert(p50 > v50 - 1e-9 && p50 <= v50 + binW + 1e-9,
        s"window $w p50: $p50 vs rank value $v50")
      assert(p95 > v95 - 1e-9 && p95 <= v95 + binW + 1e-9,
        s"window $w p95: $p95 vs rank value $v95")
    }
  }

  test("decontaminateStream: one-shot face equals the batch join bit for bit; cap fires") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val ev = docs.filter(col("doc_id") % 50 === 0)
    val batch = TextOps.decontaminate(train, ev, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val streamFace = TextOps.decontaminateStream(train, ev, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(streamFace == batch,
      s"diff=${(streamFace -- batch) ++ (batch -- streamFace)}")
    assert(batch.exists(_._3), "fixture must contain contaminated docs")
    val e = intercept[IllegalArgumentException] {
      TextOps.decontaminateStream(train, ev, maxEvalPostings = 3L)
    }
    assert(e.getMessage.contains("broadcast-sized"))
  }

  test("FeedbackIterate: cyclic streaming LPA equals the batch iterate loop; cap fires") {
    val edges = TextOps.bigrams(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .select(col("w1").as("src"), col("w2").as("dst")).distinct()
    val batch = GraphOps.labelPropagation(edges, iters = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val streamed = graft.streaming.FeedbackIterate.labelPropagation(spark, edges, iters = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(streamed == batch,
      s"cyclic run must equal batch; diff=${(streamed -- batch) ++ (batch -- streamed)}")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.FeedbackIterate.labelPropagation(spark, edges,
        maxAdjacencyEdges = 3L)
    }
    assert(e.getMessage.contains("GraphOps.labelPropagation"),
      "the cap must name the distributed batch route")
  }

  test("FeedbackIterate.connectedComponents: delta iteration reaches the exact fixpoint at any diameter") {
    val sp = spark
    import sp.implicits._
    // two components: a 9-node PATH (diameter 8 — provably beyond any
    // small fixed round bound) and a triangle, plus a self-loop-only
    // node that must be excluded by the canonicalization
    val edges = (
      (1 to 8).map(i => (s"p$i", s"p${i + 1}")) ++
        Seq(("t1", "t2"), ("t2", "t3"), ("t3", "t1"), ("z", "z"))
      ).toDF("src", "dst")
    val got = graft.streaming.FeedbackIterate.connectedComponents(spark, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected =
      (1 to 9).map(i => s"p$i" -> "p1").toMap ++
        Seq("t1" -> "t1", "t2" -> "t1", "t3" -> "t1")
    assert(got == expected,
      s"min-label fixpoint must label every node; got $got")
  }

  test("ingestWithFirewall: one-shot face == batch keep-first + batch firewall verdicts") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val tr = docs.filter(col("doc_id") % 50 =!= 0)
    val ev = docs.filter(col("doc_id") % 50 === 0)
    val got = graft.streaming.CleanPipeline.ingestWithFirewall(tr, ev, minShared = 5)
      .collect().map(r => r.doc_id -> r.contaminated).toMap
    val keepers = DedupOps.exactDedup(tr)
      .collect().map(_.getLong(0)).toSet
    assert(got.keySet == keepers, "ingest must emit exactly the batch keep-first set")
    val verdicts = TextOps.decontaminate(tr, ev, minShared = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    got.foreach { case (id, c) =>
      assert(c == verdicts(id), s"verdict mismatch for doc $id")
    }
    assert(got.values.exists(identity), "fixture must contain contaminated keepers")
  }

  test("empty delta appends are safe; missing centroids fail loudly") {
    val path = java.nio.file.Files.createTempDirectory("ivf-empty").toString
    SimilarityOps.saveIvfIndex(emb, path, nCells = 8, iters = 2)
    val before = spark.read.parquet(s"$path/assigned").count()
    SimilarityOps.appendToIvfIndex(
      SimilarityOps.ivfAssignSaved(emb.filter(col("vec_id") < 0), path), path)
    assert(spark.read.parquet(s"$path/assigned").count() == before)
    val e = intercept[Exception] {
      SimilarityOps.ivfAssignSaved(emb,
        java.nio.file.Files.createTempDirectory("no-index").toString + "/nope")
    }
    assert(e != null)
  }
}
