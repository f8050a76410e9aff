package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins for the round-10 additions: the portable heavy-hitter keys
  * (CMS + deterministic candidates) and their relationship to the
  * exact counts.
  */
class Round10OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("agg_topk_portable: CMS estimates dominate exact counts and rank-1 is the true argmax") {
    val rows = graft.SparkEntry.queries("agg_topk_portable")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("n_exact"),
        s"CMS must overcount: $r")
    }
    // the fixture's true heaviest user must surface at rank 1 (CMS
    // overcount can only promote, and ties break deterministically)
    val exactTop = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .head()
    val rank1 = rows.find(_.getAs[Int]("rnk") == 1).get
    assert(rank1.getAs[Long]("n_exact") >= exactTop.getAs[Long]("n"),
      "rank-1 candidate must carry at least the true max frequency")
  }

  test("saved IVF index: save -> load -> query is bit-identical to the in-session det form") {
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("ivf-idx-spec").toString
    SimilarityOps.saveIvfIndex(emb, path, nCells = 16, iters = 2)
    // the index is PLAIN parquet — any reader sees it
    assert(spark.read.parquet(s"$path/centroids").columns.toSeq ==
      Seq("cid", "cv", "cnrm"))
    assert(spark.read.parquet(s"$path/assigned").count() == emb.count())
    val served = SimilarityOps.knnIvfSaved(emb, path,
        isQuery = col("vec_id") < 5, nprobe = 4, k = 10)
      .collect().map(_.toSeq).toSet
    val direct = SimilarityOps.knnIvfDet(emb, isQuery = col("vec_id") < 5,
        nCells = 16, iters = 2, nprobe = 4, k = 10)
      .collect().map(_.toSeq).toSet
    assert(served == direct && served.size == 50)
  }

  test("in-memory IVF serving kernel equals the join form and the det oracle path; cap fires") {
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("ivf-serve-spec").toString
    SimilarityOps.saveIvfIndex(emb, path, nCells = 16, iters = 2)
    val served = SimilarityOps.knnLookupIvf(emb.filter(col("vec_id") < 5),
        path, nprobe = 4, k = 10)
      .collect().map(_.toSeq).toSet
    val joined = SimilarityOps.knnIvfSaved(emb, path,
        isQuery = col("vec_id") < 5, nprobe = 4, k = 10)
      .collect().map(_.toSeq).toSet
    assert(served == joined && served.size == 50,
      "the in-memory kernel and the disk-join form must agree row-for-row")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.knnLookupIvf(emb, path, maxIndexRows = 10L)
    }
    assert(e.getMessage.contains("knnIvfSaved"),
      s"the guard must name the on-disk route, got: ${e.getMessage}")
  }

  test("IVF-PQ serving kernel: persist -> load -> serve equals the det pipeline; cap fires") {
    val emb = Tables.embeddings(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("ivfpq-serve-spec").toString
    SimilarityOps.saveIvfPqIndex(emb, path, nCells = 16, cellIters = 2,
      m = 8, kCodes = 16, pqIters = 2)
    val served = SimilarityOps.knnLookupIvfPq(emb.filter(col("vec_id") < 5),
        path, nprobe = 4, rerank = 40, k = 10)
      .collect().map(_.toSeq).toSet
    val direct = SimilarityOps.knnIvfPqDet(emb, isQuery = col("vec_id") < 5,
        nCells = 16, cellIters = 2, nprobe = 4, m = 8, kCodes = 16,
        pqIters = 2, rerank = 40, k = 10)
      .collect().map(_.toSeq).toSet
    assert(served == direct && served.size == 50,
      "serve-from-store must be bit-identical to the in-session det pipeline")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.knnLookupIvfPq(emb, path, maxIndexRows = 10L)
    }
    assert(e.getMessage.contains("shard"),
      s"the guard must name the shard route, got: ${e.getMessage}")
  }

  test("knnLookup kernel equals knnCosine on the corpus; the broadcast cap fires") {
    val emb = Tables.embeddings(spark, sf)
    val viaLookup = SimilarityOps.knnLookup(
        emb.filter(col("vec_id") < 5), emb, k = 10)
      .collect().map(_.toSeq).toSet
    val viaBatch = SimilarityOps.knnCosine(emb, col("vec_id") < 5, k = 10)
      .collect().map(_.toSeq).toSet
    assert(viaLookup == viaBatch && viaLookup.size == 50)
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.knnLookup(emb, emb, maxBroadcastRows = 10L)
    }
    assert(e.getMessage.contains("knnIvfSaved"),
      s"the guard must name the saved-index route, got: ${e.getMessage}")
  }

  test("hybrid RRF: dense ranks per query, score bounds, and both arms contribute") {
    val rows = graft.SparkEntry.queries("llm_hybrid_rrf")(spark, sf).collect()
    assert(rows.length == 50)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, qs) =>
      assert(qs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 10))
    }
    // rrf ∈ (0, 2/61]: at most two rank-1 terms, at least one term
    rows.foreach { r =>
      val s = r.getAs[Double]("rrf")
      assert(s > 0 && s <= 2.0 / 61 + 1e-9, s"rrf out of bounds: $r")
    }
    // a candidate found by BOTH arms at rank 1 would score 2/61; the
    // fixture's planted near-dups make at least one fused candidate
    // exceed any single-arm maximum (1/61)
    assert(rows.exists(_.getAs[Double]("rrf") > 1.0 / 61 + 1e-9),
      "at least one candidate must be surfaced by both arms")
  }

  test("stream_topk_window_portable: per-window estimates dominate and ranks are dense per window") {
    val rows = graft.SparkEntry.queries("stream_topk_window_portable")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("n_exact"))
    }
    rows.groupBy(_.getAs[Long]("ws_us")).foreach { case (_, ws) =>
      assert(ws.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to ws.length),
        "ranks must be dense 1..k per window")
    }
  }
}
