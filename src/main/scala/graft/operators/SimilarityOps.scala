package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized embedding-similarity operators — the library surface
  * behind the fixture-bound `llm_knn_*` / `llm_dedup_embcos` keys.
  * Inputs: a DataFrame with an integral id column and an array-typed
  * embedding column (float or double elements). Cosine math rides the
  * native `vec_dot` expression (codegen fused loop, registered by
  * `graft.functions.GraftExtensions`).
  */
object SimilarityOps {

  /** `(vec_id, v: array<double>, nrm)` — normalized working set.
    * NOTE: downstream predicates (`isQuery`, `isCentroid`) are applied
    * AFTER this normalization, so they must reference `vec_id`, not the
    * original id column name. Zero-norm vectors (cosine undefined) are
    * excluded here rather than surfacing as null similarities. */
  def normed(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
      .filter(col("nrm") > 0)

  /** Two-phase per-query top-k over a scored candidate table
    * `(qid, nbr, <scoreName>)` → `(qid, nbr, <scoreName>, rk)` — shared
    * ranking tail of the whole kNN family.
    *
    * Phase 1 (map side): [[graft.functions.TopKByScore]] trims each
    * partition's candidates to its local top-k per query BEFORE the
    * exchange; phase 2 merges the ≤ partitions·k survivors per query.
    * Replaces `row_number().over(partitionBy(qid))`, whose exchange
    * carried EVERY scored pair (n·q rows to keep q·k at 100 TB). Order
    * `(score DESC, nbr ASC)` is strict, so ranks equal the window form
    * row-for-row and oracle parity is unchanged (PlanShapeSpec gates
    * the window-free plan). */
  private[graft] def topKScored(scored: DataFrame, k: Int,
      scoreName: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new graft.functions.TopKByScore(k)
    scored
      .select(col("qid").cast("long"), col("nbr").cast("long"),
        col(scoreName).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, nbr, s) => (nbr, s) }
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (qid, items) =>
        items.iterator.zipWithIndex.map { case ((nbr, s), i) => (qid, nbr, s, i + 1) }
      }
      .toDF("qid", "nbr", scoreName, "rk")
      .withColumn("rk", col("rk").cast("int"))
  }

  /** Exact top-k cosine neighbors for the query rows selected by
    * `isQuery`: `(qid, nbr, cos, rk)`.
    * @note scale: broadcasts the query set, linear-scans the partitioned
    *   corpus — no corpus shuffle; scored pairs rank through the
    *   [[topKScored]] partial top-k, so the only exchange carries
    *   ≤ partitions·q·k entries. This is the in-cell kernel of
    *   [[knnIvf]]. */
  def knnCosine(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      k: Int = 10, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // source from the cached typed working set: the normalize pass runs
    // once per session per corpus and is shared with the whole ANN
    // family (IVF/PQ/SQ8) via plan-canonical cache dedup
    val n = normedTyped(df, idCol, vecCol).toDF("vec_id", "v", "nrm")
    val q = n.filter(isQuery)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = n.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(expr("vec_dot(v, qv)") / (col("nrm") * col("qn")), 6))
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"))
    topKScored(scored, k, "cos")
  }

  /** Exact top-k cosine LOOKUP against a broadcast corpus — the
    * retrieval-SERVING kernel, and [[knnCosine]]'s role-flip: there
    * the (few) queries broadcast and the corpus scans; here the
    * corpus broadcasts and each arriving QUERY row computes its own
    * top-k inline. Because it is completely STATELESS per row (no
    * aggregation, no window), the same code runs unchanged as a
    * Structured Streaming transform in append mode — the real-time
    * retrieval shape: a stream of query vectors, each answered the
    * micro-batch it arrives (`stream_knn_lookup_replay` puts exactly
    * that path under [[knnCosine]]'s own oracle). Arithmetic is
    * bit-identical to [[knnCosine]]: same left-to-right dot product,
    * same HALF_UP round(·,6), ranking by `(cos DESC, nbr ASC)` on the
    * ROUNDED score, self excluded by id. Returns `(qid, nbr, cos, rk)`.
    *
    * @note scale: the broadcast side is N·dim·8 bytes — same 1M-row
    *   default cap and loud-fail contract as [[cosineNearDups]];
    *   beyond it, serve from a partitioned saved index
    *   ([[saveIvfIndex]]/[[knnIvfSaved]]) instead of a broadcast
    *   corpus. Per query the scan is N dot products with a k-bounded
    *   buffer — no shuffle at all on the query side. */
  def knnLookup(queries: DataFrame, corpus: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val typed = normed(corpus, idCol, vecCol)
      .select("vec_id", "v", "nrm").as[(Long, Seq[Double], Double)]
    val nSide = typed.count()
    require(nSide <= maxBroadcastRows,
      s"corpus has $nSide vectors — beyond the broadcast lookup's reach " +
        s"($maxBroadcastRows); serve from a saved IVF index (knnIvfSaved)")
    val side = typed.collect().map { case (id, v, nr) => (id, v.toArray, nr) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(side)
    val slack = 4 * k
    normed(queries, idCol, vecCol)
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { it =>
        val corpusArr = bc.value
        it.flatMap { case (qid, qvSeq, qn) =>
          val qv = qvSeq.toArray
          var buf = Vector.empty[(Double, Long)]
          def trim(b: Vector[(Double, Long)]) =
            if (b.length <= k) b
            else b.sortBy { case (s, id) => (-s, id) }.take(k)
          var i = 0
          while (i < corpusArr.length) {
            val (nid, nv, nn) = corpusArr(i)
            if (nid != qid) {
              val m = math.min(qv.length, nv.length)
              var s = 0.0
              var j = 0
              while (j < m) { s += nv(j) * qv(j); j += 1 }
              val c = java.math.BigDecimal.valueOf(s / (nn * qn))
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              buf = buf :+ ((c, nid))
              if (buf.length >= slack) buf = trim(buf)
            }
            i += 1
          }
          trim(buf).sortBy { case (s, id) => (-s, id) }
            .iterator.zipWithIndex
            .map { case ((c, nid), r) => (qid, nid, c, r + 1) }
        }
      }
      .toDF("qid", "nbr", "cos", "rk")
      .withColumn("rk", col("rk").cast("int"))
  }

  /** Int8 scalar-quantized (SQ8) top-k cosine — the storage-tier ANN
    * form vector stores default to: each normalized vector is kept as
    * `array<tinyint>` (per-vector symmetric scale `maxAbs/127`), 4×
    * smaller than float32 and 8× smaller than this library's double
    * arrays, so a 100 TB embedding corpus scans/broadcasts at a quarter
    * of the bytes. Query path: approximate scores on the quantized
    * working set shortlist the top `shortlist` per query, then ONE
    * exact re-rank over the full vectors orders the final k — the same
    * shortlist+rerank shape as [[knnPq]], with a far finer code (8 bits
    * per DIM, not per sub-block), so recall at equal shortlist depth is
    * near-1 (`SimilaritySpec` gates ≥ 0.95).
    *
    * Returns `(qid, nbr, cos, rk)` with EXACT final cosines — the
    * quantization decides only which candidates reach the re-rank.
    *
    * @note scale: the quantized corpus is what you persist/broadcast
    *   (`q8`: id, int8 codes, one double scale); the decode to the
    *   arithmetic form happens once per scan, and the exact re-rank
    *   touches shortlist×queries rows only. Same broadcast-the-queries
    *   / scan-the-corpus plan as [[knnCosine]] — no corpus shuffle. */
  def knnSq8(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      k: Int = 10, shortlist: Int = 40, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // cached shared working set (see knnCosine): the quantize branch,
    // the query branch and the exact re-rank fetch all re-read it, so
    // without the cache the normalize pass would run three times
    val n = normedTyped(df, idCol, vecCol).toDF("vec_id", "v", "nrm")
    // storage form: int8 codes + per-vector scale (what a vector store
    // persists); qd is the once-per-scan decode used in arithmetic
    val q8 = n
      .withColumn("s", greatest(expr("array_max(transform(v, x -> abs(x)))"),
        lit(1e-12)) / 127.0)
      .withColumn("q", expr("transform(v, x -> CAST(round(x / s) AS TINYINT))"))
      .withColumn("qd", expr("transform(q, x -> CAST(x AS DOUBLE))"))
    val q = q8.filter(isQuery)
      .select(col("vec_id").as("qid"), col("qd").as("qqd"), col("s").as("qs"),
        col("v").as("qv"), col("nrm").as("qn"))
    val shortIds = topKScored(
      q8.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
        .withColumn("approx",
          col("s") * col("qs") * expr("vec_dot(qd, qqd)") / (col("nrm") * col("qn")))
        .select(col("qid"), col("vec_id").as("nbr"), col("approx")),
      shortlist, "approx").select("qid", "nbr")
    // shortlist fetch: broadcast the q·shortlist winning ids back onto
    // the full-vector tier — the "fetch from the id-keyed column
    // family" step of a real vector store
    val exact = n.select(col("vec_id").as("nbr"), col("v").as("nv"),
        col("nrm").as("nn"))
      .join(broadcast(shortIds), "nbr")
      .join(broadcast(q.select(col("qid"), col("qv"), col("qn"))), "qid")
      .withColumn("cos", round(expr("vec_dot(nv, qv)") / (col("nn") * col("qn")), 6))
      .select(col("qid"), col("nbr"), col("cos"))
    topKScored(exact, k, "cos")
  }

  /** All vector pairs with cosine > `minCosine`: `(ai, bi, cos)`.
    *
    * Executes as a broadcast kernel: the normalized working set is
    * broadcast once and each partition runs a fused primitive-array
    * dot-product loop against the ids greater than its own (the
    * `ai < bi` triangle), emitting only above-threshold pairs. The
    * arithmetic reproduces the declarative form bit-for-bit — same
    * left-to-right summation as [[graft.functions.DotProduct]], same
    * `BigDecimal.valueOf(x).setScale(6, HALF_UP)` rounding as Spark's
    * `round` — so DuckDB oracle parity is unchanged. Replaces the
    * `a.vec_id < b.vec_id` theta join, whose BroadcastNestedLoopJoin
    * materialized N²/2 joined rows through row-at-a-time machinery
    * (measured 4.8 s → ~0.5 s at sf0.1).
    *
    * @note scale: the broadcast side is N·dim·8 bytes — the default
    *   1M-row cap keeps that ≈ 0.5 GB at 64-dim / 1 GB at 128-dim,
    *   well inside executor broadcast budgets; raise it deliberately
    *   if your executors are sized for more. Beyond broadcast reach,
    *   use [[cosineNearDupsBlocked]] (grid form), shard the broadcast
    *   side into S id-range slices and union the S kernel passes, or
    *   route through [[knnIvf]]-style cells / [[rhpNearDups]] LSH
    *   banding; the per-partition loop itself is embarrassingly
    *   parallel and shuffle-free. */
  def cosineNearDups(df: DataFrame, minCosine: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = normed(df, idCol, vecCol)
      .select("vec_id", "v", "nrm").as[(Long, Seq[Double], Double)]
      .persist() // evaluated twice: the collect below + the kernel scan
    // fail BEFORE the driver-side collect, not with a driver OOM —
    // beyond broadcast reach the caller routes through the blocked grid
    val n = typed.count()
    require(n <= maxBroadcastRows,
      s"corpus has $n vectors — beyond the broadcast kernel's reach " +
        s"($maxBroadcastRows); use cosineNearDupsBlocked (grid form)")
    val side = typed.collect().map { case (id, v, nr) => (id, v.toArray, nr) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(
      (side.map(_._1), side.map(_._2), side.map(_._3)))
    typed.mapPartitions { it =>
      val (bids, bvecs, bnrms) = bc.value
      it.flatMap { case (ai, avSeq, an) =>
        val av = avSeq.toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var j = java.util.Arrays.binarySearch(bids, ai)
        j = if (j >= 0) j + 1 else -(j + 1) // first id strictly greater
        while (j < bids.length) {
          val bv = bvecs(j)
          val m = math.min(av.length, bv.length)
          var s = 0.0
          var i = 0
          while (i < m) { s += av(i) * bv(i); i += 1 }
          val raw = s / (an * bnrms(j))
          // cheap prefilter; exact HALF_UP rounding only near the cut
          if (raw > minCosine - 1e-6) {
            val c = java.math.BigDecimal.valueOf(raw)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            if (c > minCosine) out += ((ai, bids(j), c))
          }
          j += 1
        }
        out.iterator
      }
    }.toDF("ai", "bi", "cos")
  }

  /** Exact all-pairs cosine above `minCosine` via a triangular block
    * grid — the lake-scale form of [[cosineNearDups]] for corpora beyond
    * broadcast reach. Vectors are hashed into `nBlocks` blocks by id;
    * every unordered block pair (i ≤ j) is a cell; each vector is
    * replicated to the `nBlocks` cells its block touches, cells are
    * shuffled once, and a tight primitive-array loop runs per cell.
    * Arithmetic and rounding are identical to [[cosineNearDups]], so the
    * two forms return the same rows.
    *
    * @note scale: shuffle volume is N·nBlocks·dim·8 bytes and a cell
    *   holds ≤ 2N/nBlocks vectors, so nBlocks trades shuffle for cell
    *   memory: 10M×128-dim at nBlocks=64 is ~640 GB shuffled across the
    *   cluster and ~320 MB per cell — both flat per-executor. Block ids
    *   come from the vector id, so every unordered pair lands in exactly
    *   one cell (no dedup pass). COMPUTE is still the exact N²/2 dot
    *   products — that is this regime's contract — so the `maxRows`
    *   guard fails fast past the point where exactness stops being the
    *   right trade: beyond it, route through [[rhpNearDups]] (LSH
    *   banding) or [[knnIvf]]-style cells, whose candidate mass is
    *   bucket-bounded instead of quadratic. */
  def cosineNearDupsBlocked(df: DataFrame, minCosine: Double, nBlocks: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxRows: Long = 10000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // fail BEFORE the quadratic pass, naming the sub-quadratic routes —
    // the same loud-misuse contract as cosineNearDups' broadcast cap
    val nIn = df.count()
    require(nIn <= maxRows,
      s"corpus has $nIn vectors — the blocked grid is the EXACT N²/2 " +
        s"regime and is capped at $maxRows; use rhpNearDups (LSH) or " +
        "knnIvf cells past it, or raise maxRows deliberately")
    val rows = normed(df, idCol, vecCol)
      .withColumn("blk", pmod(col("vec_id"), lit(nBlocks)).cast("int"))
      .withColumn("k", explode(sequence(lit(0), lit(nBlocks - 1))))
      .select(least(col("blk"), col("k")).as("ci"),
        greatest(col("blk"), col("k")).as("cj"),
        col("vec_id"), col("v"), col("nrm"))
      .as[(Int, Int, Long, Seq[Double], Double)]
    rows.groupByKey { case (ci, cj, _, _, _) => (ci, cj) }
      .flatMapGroups { (cell: (Int, Int), it: Iterator[(Int, Int, Long, Seq[Double], Double)]) =>
        val (ci, cj) = cell
        val all = it.map { case (_, _, id, v, nr) => (id, v.toArray, nr) }
          .toArray.sortBy(_._1)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        def blk(id: Long): Int = ((id % nBlocks) + nBlocks).toInt % nBlocks
        var a = 0
        while (a < all.length) {
          val (ai, av, an) = all(a)
          var b = a + 1
          while (b < all.length) {
            val (bi, bv, bn) = all(b)
            // a pair belongs to this cell iff its two blocks are exactly
            // {ci, cj} (each row sits in nBlocks cells; only one matches)
            val (pa, pb) = (blk(ai), blk(bi))
            if (math.min(pa, pb) == ci && math.max(pa, pb) == cj) {
              val m = math.min(av.length, bv.length)
              var s = 0.0
              var i = 0
              while (i < m) { s += av(i) * bv(i); i += 1 }
              val raw = s / (an * bn)
              if (raw > minCosine - 1e-6) {
                val c = java.math.BigDecimal.valueOf(raw)
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
                if (c > minCosine) out += ((ai, bi, c))
              }
            }
            b += 1
          }
          a += 1
        }
        out.iterator
      }.toDF("ai", "bi", "cos")
  }

  /** Declarative theta-join form of [[cosineNearDups]] — kept as the
    * spec cross-check and the shape to fall back to if the corpus ever
    * exceeds driver/executor broadcast memory without id-range slicing. */
  def cosineNearDupsJoin(df: DataFrame, minCosine: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = normed(df, idCol, vecCol)
    n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ai"), col("b.vec_id").as("bi"),
        round(expr("vec_dot(a.v, b.v)") / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .filter(col("cos") > minCosine)
  }

  /** IVF-style approximate kNN: vectors selected by `isCentroid` act as
    * coarse cells; every vector is assigned to its nearest cell and each
    * query scans its `nprobe` nearest cells: `(qid, nbr, cos, rk)`.
    * @note scale: scan per query drops from N to N·(nprobe/ncells);
    *   cell assignment is a narrow broadcast pass (centroids are tiny),
    *   so the only shuffle is the final per-query top-k. */
  def knnIvf(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      isCentroid: org.apache.spark.sql.Column, nprobe: Int = 4, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = normedTyped(df, idCol, vecCol)
    val cents = typed.filter(isCentroid).collect()
      .map { case (id, v, nr) => (id, v.toArray, nr) }.sortBy(_._1)
    probeCells(typed, cents, isQuery, nprobe, k)
  }

  /** [[knnIvf]] with Lloyd-refined centroids: seeds are the `nCells`
    * lowest-id vectors (deterministic), then `refineIters` passes each
    * assign every vector to its nearest centroid and replace centroids
    * with the per-cell mean. Refined centroids track the data
    * distribution instead of whatever the first `nCells` vectors
    * happened to be, so probes recall more true neighbors at the same
    * nprobe.
    *
    * The centroid table is metadata-sized (nCells·dim doubles), so the
    * Lloyd loop keeps it on the driver — the MLlib KMeans structure: per
    * pass, one narrow `mapPartitions` job computes per-partition
    * (cell → count, sum-vector) partials against the broadcast centroids
    * and the driver merges ≤ partitions·nCells partial rows. No per-pass
    * shuffle, no growing lazy plan.
    * @note scale: each pass moves O(partitions·nCells·dim) bytes to the
    *   driver — independent of corpus size; k-means|| seeding drops in
    *   here if the corpus is adversarial, without changing the probe
    *   path. */
  def knnIvfKmeans(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      nCells: Int = 16, refineIters: Int = 2, nprobe: Int = 4, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val typed = normedTyped(df, idCol, vecCol)
    probeCells(typed, trainCells(typed, nCells, refineIters), isQuery, nprobe, k)
  }

  /** [[knnIvfKmeans]] with DETERMINISTIC, oracle-rebuildable training —
    * the form that puts the IVF SHORTLIST itself (not only the
    * probe-all degenerate) under the cross-engine hash oracle. The
    * float-partial Lloyd loop in [[trainCells]] is order-dependent at
    * the last bit (partition-order float sums), which is why the
    * `nprobe < nCells` keys were rows-only; here every training step is
    * arithmetic both engines replicate exactly:
    *
    *  - seeds = the `nCells` lowest-id vectors (deterministic);
    *  - assignment = argmax cosine with `(cos DESC, cid)` tie-break,
    *    dot products summed left-to-right (`vec_dot` ↔ `list_sum`);
    *  - re-centering = per-dimension sums of `round(x·10⁹)` as EXACT
    *    BIGINTs (order-free), mean = one IEEE division per dimension;
    *  - `iters` is fixed and small, so the oracle unrolls the loop.
    *
    * The probe path is the shared `(cos DESC, cid)`-ranked nprobe
    * shortlist + exact rerank. Returns `(qid, nbr, cos, rk)`.
    *
    * @note scale: the iteration is `iters` broadcast joins of the
    *   corpus against a ≤ nCells-row centroid table plus one
    *   posexplode/groupBy per pass (shuffle on (cid, dim) — bounded by
    *   corpus·dim narrow rows); the tiny centroid table materializes
    *   per pass to keep lineage flat. Quantizing the partial sums to
    *   10⁻⁹ units costs ~1e-10 per component against unit-norm
    *   vectors — far below the round(·,6) output grid. */
  def knnIvfDet(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      nCells: Int = 16, iters: Int = 2, nprobe: Int = 4, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = normed(df, idCol, vecCol).persist()
    val cents = detTrainCells(n, nCells, iters)
    val assigned = detAssignCells(n, cents)
    val probes = detProbes(n, cents, isQuery, math.min(nprobe, nCells))
    val scored = assigned.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos",
        round(expr("vec_dot(v, qv)") / (col("nrm") * col("qn")), 6))
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"))
    topKScored(scored, k, "cos")
  }

  /** PERSIST a deterministically-trained IVF index — the
    * train-once/serve-many split every production ANN deployment
    * makes: [[knnIvfDet]]'s trainer runs once (offline, the expensive
    * pass), and the resulting index lands as TWO PLAIN PARQUET tables
    * under `path` — `centroids/` (≤ nCells rows: cid, cv, cnrm) and
    * `assigned/` (one row per corpus vector: vec_id, v, nrm, cid) —
    * readable by any engine, no custom format. [[knnIvfSaved]] serves
    * queries against it without ever re-touching the training path.
    * Because the training is the det (exact-BIGINT) form and parquet
    * round-trips doubles exactly, save → load → query is
    * bit-identical to [[knnIvfDet]] — which is what lets the
    * `llm_knn_ivf_saved` key reuse the det oracle verbatim, gating
    * the PERSISTENCE itself.
    *
    * @note scale: `assigned/` is the corpus + one int — and it is
    *   WRITTEN `partitionBy("cid")`, so the serve-side probe
    *   ([[knnIvfSaved]]) partition-prunes to the probed cells' files
    *   at the scan: a 1-cell probe reads ~1/nCells of the corpus
    *   bytes, never the whole table (gated by `AnnIndexLayoutSpec`).
    *   Rows additionally carry `epoch` (0 at bulk build) so the
    *   delete path's versioned tombstones can mask exactly the rows
    *   that existed when the delete was issued — see
    *   [[deleteFromIvfIndex]].
    *
    * Rebuild-in-place is safe: a bulk build RESETS `tombstones/` and
    * the `epochs/` counter before writing — without that, tombstones
    * surviving from the index's previous life (epoch ≥ 1) would mask
    * every fresh epoch-0 row and the rebuilt index would silently
    * serve nothing (spec-pinned by `AnnIndexLayoutSpec`). */
  def saveIvfIndex(df: DataFrame, path: String, nCells: Int = 16,
      iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding", trainOn: Option[DataFrame] = None): Unit = {
    deleteDir(java.nio.file.Paths.get(s"$path/tombstones"))
    EpochLog.reset(path)
    val n = normed(df, idCol, vecCol).persist()
    // trainOn: centroids from a designated training corpus (the bulk
    // epoch) while `df` is what gets indexed — the split the append
    // maintenance path ([[ivfAssignSaved]]) relies on
    val nt = trainOn.fold(n)(t => normed(t, idCol, vecCol))
    val cents = detTrainCells(nt, nCells, iters)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    detAssignCells(n, cents).withColumn("epoch", lit(0L))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/assigned")
    n.unpersist()
    ()
  }

  /** INDEX MAINTENANCE kernel: assign NEW vectors to their cells in a
    * [[saveIvfIndex]] index — the stateless ingest half of the ANN
    * lifecycle (train once → bulk build → APPEND deltas → serve).
    * The saved centroid table loads once and broadcasts; each arriving
    * vector routes to its argmax-cosine cell with arithmetic
    * bit-identical to the batch builder's `detAssignCells` (`vec_dot`
    * left-to-right sum, `(cos DESC, cid)` tie-break), so rows appended
    * by [[appendToIvfIndex]] are indistinguishable from rows the bulk
    * build would have written — append-maintenance loses NOTHING vs a
    * from-scratch rebuild, which is exactly what
    * `stream_ann_upsert_replay` hash-certifies. No shuffle, no state:
    * the same code answers a Structured Streaming delta feed in append
    * mode within its own micro-batch.
    *
    * Returns `(vec_id, v, nrm, cid)` — the `assigned/` table's schema.
    *
    * @note scale: per new vector the cost is nCells dot products
    *   against broadcast metadata (nCells·dim doubles). Centroids are
    *   deliberately FROZEN between epoch retrains — cell drift under
    *   append is the standard IVF trade (recall decays as the delta
    *   distribution shifts; the epoch trainer re-runs offline and
    *   rebuilds, exactly [[saveIvfIndex]]'s train-once split). */
  def ivfAssignSaved(newVecs: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = newVecs.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cid").cast("long"), col("cv"), col("cnrm"))
      .as[(Long, Seq[Double], Double)].collect()
      .map(c => (c._1, c._2.toArray, c._3)).sortBy(_._1)
    require(cents.nonEmpty, s"no centroids at $path/centroids")
    val bc = spark.sparkContext.broadcast(cents)
    normed(newVecs, idCol, vecCol)
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { it =>
        val cen = bc.value
        it.map { case (id, vSeq, nrm) =>
          val v = vSeq.toArray
          var bestCos = Double.NegativeInfinity
          var bestCid = Long.MaxValue
          cen.foreach { case (cid, cv, cnrm) =>
            val m = math.min(v.length, cv.length)
            var s = 0.0
            var j = 0
            while (j < m) { s += v(j) * cv(j); j += 1 }
            val c = s / (nrm * cnrm)
            if (c > bestCos || (c == bestCos && cid < bestCid)) {
              bestCos = c; bestCid = cid
            }
          }
          (id, vSeq, nrm, bestCid)
        }
      }
      .toDF("vec_id", "v", "nrm", "cid")
  }

  /** Claim the index's next write EPOCH — a monotonic counter kept as
    * empty marker files under `path/epochs/` (`e1`, `e2`, …): O(1), no
    * table scan, and deterministic across reruns (the counter depends
    * only on how many mutations preceded it, never on wall clock).
    * Every append and every delete claims one, which is what lets a
    * tombstone mask exactly the rows that existed when it was issued.
    * A production lake would use its transaction log's commit id here
    * — same monotonicity contract. */
  private def nextEpoch(path: String): Long = EpochLog.next(path)

  /** Append [[ivfAssignSaved]] rows to the index's `assigned/` table —
    * the commit half of ANN index maintenance. Plain parquet append
    * into the same `partitionBy("cid")` layout the bulk build wrote
    * (so serve-side partition pruning keeps holding), stamped with the
    * next write epoch: a row appended AFTER a delete of the same id
    * carries a higher epoch than the tombstone and serves immediately
    * — delete → re-insert needs no compaction. Any engine can read
    * the result, and [[knnIvfSaved]] / [[knnLookupIvf]] serve the
    * maintained index unchanged. */
  def appendToIvfIndex(assigned: DataFrame, path: String): Unit = {
    assigned.select(col("vec_id"), col("v"), col("nrm"), col("cid"))
      .withColumn("epoch", lit(nextEpoch(path)))
      .write.mode("append").partitionBy("cid").parquet(s"$path/assigned")
    ()
  }

  /** DELETE half of ANN index maintenance: record `ids` as TOMBSTONES
    * — a plain-parquet append under `path/tombstones/` (`vec_id` +
    * the write `epoch` the delete claimed). Serving ([[knnIvfSaved]],
    * [[knnLookupIvf]]) anti-joins out exactly the assigned rows whose
    * epoch is ≤ the tombstone's, so a delete is visible at the next
    * query with ZERO index rewrite — the LSM delete shape;
    * [[compactIvfIndex]] folds them into `assigned/` offline.
    * Stateless and shuffle-free: the same code absorbs a streaming
    * delete feed within its own micro-batch
    * (`stream_ann_delete_replay` gates exactly that against the
    * full-training oracle with a survivor filter).
    *
    * VERSIONED masking: the tombstone masks every row of that id
    * appended at or before the delete, and NOTHING after it — a later
    * [[appendToIvfIndex]] re-insert of the same id claims a higher
    * epoch and serves without waiting for compaction
    * (delete → re-insert == rebuild-after-reinsert, spec-pinned on
    * both serve kernels). */
  def deleteFromIvfIndex(ids: DataFrame, path: String,
      idCol: String = "vec_id"): Unit = {
    ids.select(col(idCol).cast("long").as("vec_id"))
      .withColumn("epoch", lit(nextEpoch(path)))
      .write.mode("append").parquet(s"$path/tombstones")
    ()
  }

  /** The index's live tombstone set `(vec_id, epoch)`, if any deletes
    * were recorded — one row per id at its LATEST delete epoch. */
  private def tombstonesOf(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val dir = java.nio.file.Paths.get(path, "tombstones")
    if (java.nio.file.Files.isDirectory(dir))
      Some(spark.read.parquet(dir.toString)
        .groupBy(col("vec_id").cast("long").as("vec_id"))
        .agg(max(col("epoch")).as("epoch")))
    else None
  }

  /** Apply an index's tombstones to its `assigned/` rows (no-op when
    * none were recorded) — the serve-time half of the delete path:
    * a row survives unless a tombstone of its id was issued AT OR
    * AFTER the row's own write epoch. */
  private def minusTombstones(spark: SparkSession, path: String,
      assigned: DataFrame): DataFrame =
    tombstonesOf(spark, path).fold(assigned) { t =>
      assigned.as("a").join(t.as("t"),
        col("a.vec_id") === col("t.vec_id") &&
          col("t.epoch") >= col("a.epoch"), "left_anti")
    }

  /** Fold tombstones into the index: rewrite `assigned/` without the
    * masked rows (epoch-aware — a re-insert newer than its id's
    * tombstone survives) and drop `tombstones/` — serve-before ==
    * serve-after (spec-pinned), the offline compaction of the
    * LSM-style delete path. The rewrite keeps the `partitionBy("cid")`
    * layout, so serve-side partition pruning holds across compactions.
    * At scale this is the same economics as the view-maintainer's
    * snapshot compaction: pay one O(index) rewrite to make every
    * subsequent serve tombstone-free. */
  def compactIvfIndex(spark: SparkSession, path: String): Unit =
    tombstonesOf(spark, path).foreach { t =>
      val survivors = minusTombstones(spark, path,
        spark.read.parquet(s"$path/assigned"))
        .select(col("vec_id"), col("v"), col("nrm"), col("epoch"),
          col("cid"))
      val tmp = java.nio.file.Paths.get(s"$path/assigned_compact")
      survivors.write.mode("overwrite").partitionBy("cid")
        .parquet(tmp.toString)
      deleteDir(java.nio.file.Paths.get(s"$path/assigned"))
      java.nio.file.Files.move(tmp,
        java.nio.file.Paths.get(s"$path/assigned"))
      deleteDir(java.nio.file.Paths.get(s"$path/tombstones"))
    }

  private def deleteDir(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
  }

  /** CELL-BLOCKED embedding near-dup — the SemDeDup-shaped semantic
    * dedup route (Abbas et al., arXiv:2303.09540: cluster the
    * embedding space, search for duplicates only WITHIN each
    * cluster): vectors det-k-means-assign to `nCells` cells
    * ([[knnIvfDet]]'s deterministic trainer, so the whole pipeline is
    * oracle-rebuildable), and exact pairwise cosine runs per cell —
    * quadratic only in the CELL population, never the corpus.
    * Returns `(ai, bi, cos ≥ minCosine)` for same-cell pairs.
    *
    * Recall contract: a pair is found iff BOTH vectors land in the
    * same cell — near-identical vectors route together except
    * boundary-straddling pairs (the SemDeDup trade; raise `nprobe`-
    * style recall by lowering `nCells`, or run [[rhpNearDups]] for
    * the probabilistic any-pair route and [[cosineNearDups]] for the
    * exact kernel below its cap). Within-cell recall is COMPLETE —
    * `llm_dedup_embcell`'s oracle replays training, assignment and
    * the in-cell join, and the spec pins the subset/coverage
    * relations against the exact kernel.
    *
    * @note scale: one shuffle on `cid`; per-cell cost is
    *   Σ |cell|²/2 dot products — at balanced cells corpus²/(2·nCells)
    *   vs the kernel's corpus²/2, and `nCells` scales with corpus so
    *   per-cell populations stay bounded (the SemDeDup paper runs
    *   100k clusters over web-scale corpora). A hot cell (mass near a
    *   centroid) is the skew risk: re-train with higher `nCells`, or
    *   sub-split the offender — the standard IVF imbalance levers. */
  def cosineNearDupsCelled(df: DataFrame, minCosine: Double,
      nCells: Int = 16, iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val n = normed(df, idCol, vecCol).persist()
    val a = detAssignCells(n, detTrainCells(n, nCells, iters))
    a.as("a").hint("shuffle_hash")
      .join(a.as("b"), col("a.cid") === col("b.cid") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        round(expr("vec_dot(a.v, b.v)") / (col("a.nrm") * col("b.nrm")), 6))
      .filter(col("cos") >= minCosine)
      .select(col("a.vec_id").as("ai"), col("b.vec_id").as("bi"), col("cos"))
  }

  /** Serve kNN queries from a [[saveIvfIndex]] index: route each query
    * to its `nprobe` nearest saved centroids, hash-join the probed
    * cells' members, exact-rerank — the online half. Query vectors
    * come from `queries` (any frame with id + vector columns;
    * `isQuery` filters it after id normalization); self-matches are
    * excluded by id, matching [[knnIvfDet]]. Returns
    * `(qid, nbr, cos, rk)`.
    *
    * @note scale: serve cost is a broadcast of ≤ nCells centroid rows
    *   + one hash join of the probe list against the assigned table.
    *   The probed cell ids (≤ nCells values however many queries ride
    *   the batch) are collected and pushed as a STATIC `cid IN (…)`
    *   filter, which partition-prunes the `partitionBy("cid")` layout
    *   [[saveIvfIndex]] writes — a 1-cell probe reads ~1/nCells of
    *   `assigned/`'s files, never the whole table
    *   (`AnnIndexLayoutSpec` pins selectedPartitions == probed
    *   cells). No training pass, no full-corpus scan. The probe
    *   routing runs ONCE: the probes frame was already the broadcast
    *   side of the serve join — i.e. driver-memory-bounded by design
    *   — so it is collected a single time and both the probed-cell
    *   set and the join's (local-relation) build side come from that
    *   one evaluation, instead of running the window-ranked
    *   crossJoin as two jobs.
    *
    * BATCH-ONLY: the probed-cell collect (and the window ranking)
    * are illegal on a streaming frame — streaming serves go through
    * [[knnLookupIvf]], the broadcast-index twin. */
  def knnIvfSaved(queries: DataFrame, path: String,
      isQuery: org.apache.spark.sql.Column, nprobe: Int = 4, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxProbeRows: Int = 200000): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$path/centroids")
    val nq = normed(queries, idCol, vecCol).filter(isQuery)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("__cos").desc, col("cid"))
    val probesPlan = nq.crossJoin(broadcast(cents))
      .withColumn("__cos", expr("vec_dot(qv, cv)") / (col("qn") * col("cnrm")))
      .withColumn("__rk", row_number().over(wq))
      .filter(col("__rk") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cid").cast("long").as("cid"))
    // the probes frame is the serve join's BROADCAST side, i.e.
    // driver-memory-bounded by design — collect it once; the probed
    // cells (≤ nCells values) fall out of the same rows and become a
    // static partition-pruned filter on the assigned-table scan, and
    // the local relation below is the join's build side with no
    // second probe-routing job
    // the collected mass is nq×nprobe ROWS WITH FULL QUERY VECTORS —
    // driver footprint scales with the query batch, not the ≤nCells
    // cid set. Loud cap (like every driver-bounded collect in this
    // library) naming the route that never collects: past it, the
    // query batch is no longer a "probe set", it is a corpus — use
    // knnLookupIvf (broadcast-index, streaming-safe) or knnIvfDet
    // (full distributed join) instead. The limit(cap+1) keeps the cap
    // AHEAD of the collect — the driver never materializes more than
    // cap+1 rows even on an oversized batch (a bare collect-then-check
    // would hold the whole blow-up before the require fired, leaving
    // only spark.driver.maxResultSize as the real backstop).
    val probeRows = probesPlan.limit(maxProbeRows + 1).collect()
    require(probeRows.length <= maxProbeRows,
      s"knnIvfSaved collected over maxProbeRows=$maxProbeRows probe " +
        "rows: the query batch is too large for the collect-once serve " +
        "path — route it through knnLookupIvf (broadcast index) or " +
        "knnIvfDet (distributed join)")
    val probedCells = probeRows.map(_.getLong(3)).distinct.toSeq
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probesPlan.schema)
    val assigned = minusTombstones(spark, path,
      spark.read.parquet(s"$path/assigned")
        .filter(col("cid").isin(probedCells: _*)))
    val scored = assigned.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos",
        round(expr("vec_dot(v, qv)") / (col("nrm") * col("qn")), 6))
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"))
    topKScored(scored, k, "cos")
  }

  /** Serve kNN queries from a [[saveIvfIndex]] index held IN MEMORY —
    * the online ANN-serving kernel, and the stateless/streaming twin
    * of [[knnIvfSaved]] (whose probe ranking is a window function —
    * fine batch-side, unavailable on a stream): the centroid table
    * and the cid-grouped corpus load once, broadcast, and each
    * arriving query row routes itself to its `nprobe` nearest cells
    * and scans ONLY those cells' vectors, top-k inline. No shuffle,
    * no state — the same code answers a Structured Streaming query
    * stream in append mode within its own micro-batch
    * (`stream_knn_ivf_serve_replay` gates exactly that against the
    * FULL det-training oracle: train → persist → serve, end to end).
    * Arithmetic is bit-identical to [[knnIvfDet]]: probe ranking on
    * the raw cosine with `(cos DESC, cid)` ties, candidate cosine
    * `round(·,6)`, final `(cos DESC, nbr ASC)`, self excluded.
    *
    * @note scale: this is the ANN serving deployment shape — the
    *   index LIVES in the serving fleet's memory (N·dim·8 bytes;
    *   the `maxIndexRows` cap fails loudly past it — shard the
    *   id space across serving jobs, or fall back to the
    *   [[knnIvfSaved]] join form where the index stays on disk and
    *   cid-partition pruning does the cell selection). Per query:
    *   nCells centroid dots + the probed cells' ≈ nprobe/nCells
    *   corpus fraction. */
  def knnLookupIvf(queries: DataFrame, path: String, nprobe: Int = 4,
      k: Int = 10, idCol: String = "vec_id", vecCol: String = "embedding",
      maxIndexRows: Long = 1000000L): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cid").cast("long"), col("cv"), col("cnrm"))
      .as[(Long, Seq[Double], Double)].collect()
      .map(c => (c._1, c._2.toArray, c._3)).sortBy(_._1)
    val assignedDs = minusTombstones(spark, path,
        spark.read.parquet(s"$path/assigned"))
      .select(col("vec_id").cast("long"), col("v"), col("nrm"),
        col("cid").cast("long"))
      .as[(Long, Seq[Double], Double, Long)]
    val nIdx = assignedDs.count()
    require(nIdx <= maxIndexRows,
      s"saved index holds $nIdx vectors — beyond the in-memory serving " +
        s"cap ($maxIndexRows); shard the id space across serving jobs or " +
        "use the knnIvfSaved join form (index stays on disk)")
    val cells: Map[Long, Array[(Long, Array[Double], Double)]] =
      assignedDs.collect().groupBy(_._4).map { case (cid, rows) =>
        cid -> rows.map(r => (r._1, r._2.toArray, r._3)).sortBy(_._1)
      }
    val bcC = spark.sparkContext.broadcast(cents)
    val bcCells = spark.sparkContext.broadcast(cells)
    val np = math.min(nprobe, cents.length)
    normed(queries, idCol, vecCol)
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { it =>
        val cen = bcC.value
        val byCell = bcCells.value
        it.flatMap { case (qid, qvSeq, qn) =>
          val qv = qvSeq.toArray
          // probe routing: raw cosine, (cos DESC, cid) — detProbes' order
          val probed = cen.map { case (cid, cv, cnrm) =>
            val m = math.min(qv.length, cv.length)
            var s = 0.0
            var j = 0
            while (j < m) { s += qv(j) * cv(j); j += 1 }
            (s / (qn * cnrm), cid)
          }.sortBy { case (c, cid) => (-c, cid) }.take(np).map(_._2)
          var buf = Vector.empty[(Double, Long)]
          def trim(b: Vector[(Double, Long)]) =
            if (b.length <= k) b
            else b.sortBy { case (s, id) => (-s, id) }.take(k)
          probed.foreach { cid =>
            byCell.getOrElse(cid, Array.empty).foreach { case (nid, nv, nn) =>
              if (nid != qid) {
                val m = math.min(qv.length, nv.length)
                var s = 0.0
                var j = 0
                while (j < m) { s += nv(j) * qv(j); j += 1 }
                val c = java.math.BigDecimal.valueOf(s / (nn * qn))
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
                buf = buf :+ ((c, nid))
                if (buf.length >= 4 * k) buf = trim(buf)
              }
            }
          }
          trim(buf).sortBy { case (s, id) => (-s, id) }
            .iterator.zipWithIndex
            .map { case ((c, nid), r) => (qid, nid, c, r + 1) }
        }
      }
      .toDF("qid", "nbr", "cos", "rk")
      .withColumn("rk", col("rk").cast("int"))
  }

  /** Deterministic argmax-cosine cell assignment — `(cos DESC, cid)`
    * tie-break, shared by the det IVF forms. */
  private def detAssignCells(n: DataFrame, cents: DataFrame): DataFrame =
    // argmax-by-aggregation instead of row_number over a window: the
    // min(struct) carries the (−cos, cid) order key plus the payload,
    // aggregates map-side before one exchange of ≤ one row per vector,
    // and never sorts. (−x) preserves Double.compare order exactly, so
    // the (cos DESC, cid ASC) pick is bit-identical to the old window;
    // (−cos, cid) is unique per vector, so the payload fields are
    // never reached by the struct comparison.
    n.crossJoin(broadcast(cents))
      .withColumn("__cos",
        expr("vec_dot(v, cv)") / (col("nrm") * col("cnrm")))
      .groupBy(col("vec_id"))
      .agg(min(struct(negate(col("__cos")).as("nc"), col("cid"),
        col("v"), col("nrm"))).as("m"))
      .select(col("vec_id"), col("m.v").as("v"), col("m.nrm").as("nrm"),
        col("m.cid").as("cid"))

  /** Deterministic k-means cells (lowest-id seeds, exact-BIGINT
    * 10⁻⁹-unit re-centering, `iters` fixed passes) — the trainer the
    * `llm_knn_ivf_det` oracle unrolls; materializes ≤ nCells rows per
    * pass. */
  private def detTrainCells(n: DataFrame, nCells: Int,
      iters: Int): DataFrame = {
    val spark = n.sparkSession
    import spark.implicits._
    var cents = n.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    for (_ <- 1 to iters) {
      val next = detAssignCells(n, cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
        .withColumn("x9", round(col("x") * lit(1.0e9)).cast("long"))
        .groupBy("cid", "i")
        .agg(sum(col("x9")).as("s9"), count(lit(1)).as("cnt"))
        .withColumn("mean", col("s9").cast("double") / col("cnt") / lit(1.0e9))
        .groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("i").as("i"), col("mean").as("m")))),
          s => s.getField("m")).as("cv"))
        .withColumn("cnrm", sqrt(expr("vec_dot(cv, cv)")))
        .filter(col("cnrm") > 0)
        .as[(Long, Seq[Double], Double)].collect().sortBy(_._1) // ≤ nCells rows
      cents = spark.createDataset(next.toIndexedSeq).toDF("cid", "cv", "cnrm")
    }
    cents
  }

  /** Each query's `np` nearest cells, `(cos DESC, cid)`-ranked:
    * `(qid, qv, qn, cid)`. */
  private def detProbes(n: DataFrame, cents: DataFrame,
      isQuery: org.apache.spark.sql.Column, np: Int): DataFrame =
    // top-np by sorted-slice aggregation instead of a window: one
    // hash agg of ≤ nCells structs per query, sliced to np — the
    // (−cos, cid) struct sort is bit-identical to the old
    // (cos DESC, cid ASC) window order (see detAssignCells).
    n.filter(isQuery)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("__cos", expr("vec_dot(qv, cv)") / (col("qn") * col("cnrm")))
      .groupBy(col("qid"))
      .agg(slice(array_sort(collect_list(struct(
        negate(col("__cos")).as("nc"), col("cid"),
        col("qv"), col("qn")))), 1, np).as("top"))
      .select(col("qid"), explode(col("top")).as("e"))
      .select(col("qid"), col("e.qv").as("qv"), col("e.qn").as("qn"),
        col("e.cid").as("cid"))

  /** [[knnPq]] with DETERMINISTIC, oracle-rebuildable codebook training
    * — [[knnIvfDet]]'s exact-BIGINT re-centering applied per SUBSPACE,
    * so the full PQ pipeline (both Lloyd passes per codebook, encoding,
    * ADC scoring, shortlist, exact rerank) is arithmetic both engines
    * replicate exactly and the DuckDB oracle hash-checks it end to end:
    *
    *  - unit vectors split into `m` subspaces; seeds = the `kCodes`
    *    lowest-id subvectors, code index = the seed's id rank;
    *  - assignment = argmin L2 with `(dist ASC, code ASC)` tie-break,
    *    the squared-difference fold summed left-to-right;
    *  - re-centering = per-dimension `round(x·10⁹)` BIGINT sums (one
    *    IEEE division per dimension); empty codes keep their previous
    *    centroid on BOTH engines (left-join + coalesce);
    *  - ADC = per-(query, subspace, code) table entries quantized to
    *    10⁻¹² units, so the per-candidate sum over subspaces is EXACT
    *    integer addition (order-free) — the one place the float form
    *    would be partition-order-dependent;
    *  - exact rerank of the top `rerank` ADC candidates, final top-k.
    *
    * Returns `(qid, nbr, cos, rk)` with EXACT final cosines.
    *
    * @note scale: every stage is a broadcast join against ≤ m·kCodes
    *   codebook rows or a groupBy on (subspace, code, dim) — narrow,
    *   corpus-size-independent metadata everywhere except the one ADC
    *   scan; the codebook materializes per pass (m·kCodes rows) to
    *   keep lineage flat. */
  def knnPqDet(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      m: Int = 8, kCodes: Int = 16, iters: Int = 2, rerank: Int = 40,
      k: Int = 10, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val n = normed(df, idCol, vecCol)
    val u = n.select(col("vec_id"),
      expr("transform(v, x -> x / nrm)").as("uv")).persist()
    val sp = detSubspaces(u, m)
    val book = detTrainBooks(sp, u, kCodes, iters)
    val adc = detAdcScores(sp, book, isQuery)
    detExactRerank(adc, u, isQuery, rerank, k)
  }

  /** Unit vectors split into `m` per-subspace rows `(vec_id, j, sv)`.
    * Shared by the det PQ forms. */
  private def detSubspaces(u: DataFrame, m: Int): DataFrame = {
    val dim = u.select(size(col("uv"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    u.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("j"), col("uv"))
      .withColumn("sv", expr(s"slice(uv, j * $sub + 1, $sub)"))
      .select("vec_id", "j", "sv").persist()
  }

  /** Deterministic argmin-L2 code assignment — `(dist ASC, code ASC)`
    * tie-break, squared-difference fold left-to-right. */
  private def detAssignCodes(sp: DataFrame, book: DataFrame): DataFrame =
    // argmin-by-aggregation (see detAssignCells): min(struct(d, c))
    // replicates the (dist ASC, code ASC) window pick exactly — (d, c)
    // is unique per (vector, subspace) — with a map-side partial agg
    // instead of an exchange + sort of corpus·kCodes rows.
    sp.join(broadcast(book), "j")
      .withColumn("__d", expr(
        "aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, e) -> acc + e)"))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(col("__d"), col("c"))).as("m"))
      .select(col("vec_id"), col("j"), col("m.c").as("c"))

  /** Deterministic per-subspace codebooks (lowest-id seeds, code index
    * = seed id rank, exact-BIGINT re-centering, empty codes keep their
    * previous centroid) — the trainer the `llm_knn_pq_det` oracle
    * unrolls; materializes m·kCodes rows per pass. */
  private def detTrainBooks(sp: DataFrame, u: DataFrame, kCodes: Int,
      iters: Int): DataFrame = {
    val spark = sp.sparkSession
    import spark.implicits._
    val seedIds = u.orderBy("vec_id").limit(kCodes).select("vec_id")
    var book: DataFrame = sp.join(broadcast(seedIds), "vec_id")
      .withColumn("c", row_number().over(
        Window.partitionBy(col("j")).orderBy(col("vec_id"))) - 1)
      .select(col("j"), col("c"), col("sv").as("cv"))
    for (_ <- 1 to iters) {
      val means = detAssignCodes(sp, book).join(sp, Seq("vec_id", "j"))
        .select(col("j"), col("c"), posexplode(col("sv")).as(Seq("i", "x")))
        .withColumn("x9", round(col("x") * lit(1.0e9)).cast("long"))
        .groupBy("j", "c", "i")
        .agg(sum(col("x9")).as("s9"), count(lit(1)).as("cnt"))
        .withColumn("mean", col("s9").cast("double") / col("cnt") / lit(1.0e9))
        .groupBy("j", "c")
        .agg(transform(
          array_sort(collect_list(struct(col("i").as("i"), col("mean").as("mn")))),
          s => s.getField("mn")).as("ncv"))
      val next = book.join(means, Seq("j", "c"), "left")
        .select(col("j"), col("c"), coalesce(col("ncv"), col("cv")).as("cv"))
        .as[(Int, Int, Seq[Double])].collect().sortBy(r => (r._1, r._2))
      book = spark.createDataset(next.toIndexedSeq).toDF("j", "c", "cv")
    }
    book
  }

  /** ADC scores for every (query, corpus) pair: 10⁻¹²-unit-quantized
    * per-(query, subspace, code) table entries, summed as EXACT
    * integers per candidate — `(qid, nbr, score)`. */
  private def detAdcScores(sp: DataFrame, book: DataFrame,
      isQuery: org.apache.spark.sql.Column): DataFrame = {
    val af = detAssignCodes(sp, book)
    val qt = detAdcTable(sp, book, isQuery)
    af.join(broadcast(qt),
        af("j") === qt("j") && af("c") === qt("c") &&
          af("vec_id") =!= qt("qid"))
      .groupBy(col("qid"), col("vec_id").as("nbr"))
      .agg(round(sum(col("t12")).cast("double") / lit(1.0e12), 6).as("score"))
  }

  /** Per-(query, subspace, code) quantized dot-product table. */
  private def detAdcTable(sp: DataFrame, book: DataFrame,
      isQuery: org.apache.spark.sql.Column): DataFrame =
    sp.filter(isQuery).join(broadcast(book), "j")
      .withColumn("t12", round(expr(
        "aggregate(zip_with(sv, cv, (x, y) -> x * y), 0D, (acc, e) -> acc + e)")
        * lit(1.0e12)).cast("long"))
      .select(col("vec_id").as("qid"), col("j"), col("c"), col("t12"))

  /** Exact-rerank tail shared by the det PQ forms: rescore the top
    * `rerank` approximate candidates on the unit vectors, final top-k. */
  private def detExactRerank(adc: DataFrame, u: DataFrame,
      isQuery: org.apache.spark.sql.Column, rerank: Int, k: Int): DataFrame = {
    val short = topKScored(adc, rerank, "score").select("qid", "nbr")
    val qvecs = broadcast(u.filter(isQuery)
      .select(col("vec_id").as("qid"), col("uv").as("qv")))
    val exact = u.select(col("vec_id").as("nbr"), col("uv").as("nv"))
      .join(broadcast(short), "nbr").join(qvecs, "qid")
      .withColumn("cos", round(expr("vec_dot(nv, qv)"), 6))
      .select(col("qid"), col("nbr"), col("cos"))
    topKScored(exact, k, "cos")
  }

  /** The FULL production ANN stack — IVF cells pruning the scan, PQ
    * codes compressing it, exact rerank ordering the tail — with BOTH
    * trainings deterministic, so the `llm_knn_ivfpq_det` oracle
    * rebuilds cells ([[detTrainCells]]), codebooks ([[detTrainBooks]]),
    * probe routing, in-cell ADC scoring and the rerank, hash-checking
    * the entire pipeline (the float-Lloyd [[knnIvfPq]] stays the speed
    * path, rows-only). Candidates are ADC-scored ONLY inside each
    * query's `nprobe` cells. Returns `(qid, nbr, cos, rk)` with exact
    * final cosines.
    *
    * @note scale: composition of the two det trainers' costs; the ADC
    *   scan touches nprobe/nCells of the corpus — the same pruning
    *   ratio as [[knnIvfPq]]. */
  def knnIvfPqDet(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      nCells: Int = 16, cellIters: Int = 2, nprobe: Int = 4,
      m: Int = 8, kCodes: Int = 16, pqIters: Int = 2, rerank: Int = 40,
      k: Int = 10, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val n = normed(df, idCol, vecCol).persist()
    val cents = detTrainCells(n, nCells, cellIters)
    val cellOf = detAssignCells(n, cents).select("vec_id", "cid")
    val probes = detProbes(n, cents, isQuery, math.min(nprobe, nCells))
      .select("qid", "cid")
    val u = n.select(col("vec_id"),
      expr("transform(v, x -> x / nrm)").as("uv")).persist()
    val sp = detSubspaces(u, m)
    val book = detTrainBooks(sp, u, kCodes, pqIters)
    val af = detAssignCodes(sp, book)
    val qt = detAdcTable(sp, book, isQuery)
    // candidates = corpus rows inside each query's probed cells
    val cand = cellOf.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    val adc = cand.join(af, "vec_id")
      .join(broadcast(qt), Seq("qid", "j", "c"))
      .groupBy(col("qid"), col("vec_id").as("nbr"))
      .agg(round(sum(col("t12")).cast("double") / lit(1.0e12), 6).as("score"))
    detExactRerank(adc, u, isQuery, rerank, k)
  }

  /** PERSIST the full det-trained IVF-PQ index — [[saveIvfIndex]]'s
    * big sibling, five plain parquet tables under `path`:
    * `centroids/` (coarse cells), `cellOf/` (vec_id → cid routing),
    * `books/` (m·kCodes subspace codebooks), `codes/` (the PQ-ENCODED
    * corpus — one small int per (vector, subspace), the compressed
    * form a serving fleet actually holds hot), and `unit/` (the full
    * unit vectors, which production keeps COLD — the rerank touches
    * only `rerank` of them per query as point fetches). Training is
    * [[knnIvfPqDet]]'s deterministic form, so persist → serve is
    * bit-identical to it and `stream_knn_ivfpq_serve_replay` gates
    * the whole loop under its oracle.
    *
    * @note scale: `codes/` is the hot set — m small-ints per vector
    *   (~8 B at m=8) vs dim·8 B for raw doubles, the 64× compression
    *   that makes billion-vector serving fit memory; partition
    *   `cellOf/`+`codes/` by cid in a real deployment. */
  def saveIvfPqIndex(df: DataFrame, path: String, nCells: Int = 16,
      cellIters: Int = 2, m: Int = 8, kCodes: Int = 16, pqIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val n = normed(df, idCol, vecCol).persist()
    val cents = detTrainCells(n, nCells, cellIters)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    detAssignCells(n, cents).select("vec_id", "cid")
      .write.mode("overwrite").parquet(s"$path/cellOf")
    val u = n.select(col("vec_id"),
      expr("transform(v, x -> x / nrm)").as("uv")).persist()
    val sp = detSubspaces(u, m)
    val book = detTrainBooks(sp, u, kCodes, pqIters)
    book.write.mode("overwrite").parquet(s"$path/books")
    detAssignCodes(sp, book).write.mode("overwrite").parquet(s"$path/codes")
    u.write.mode("overwrite").parquet(s"$path/unit")
    n.unpersist(); u.unpersist(); sp.unpersist()
    ()
  }

  /** Serve kNN from a [[saveIvfPqIndex]] index — the full production
    * ANN serving kernel, stateless per query row (so it runs
    * unchanged on a Structured Streaming query stream): route to
    * `nprobe` cells against the in-memory centroids, ADC-score the
    * probed cells' PQ CODES against the query's per-(subspace, code)
    * table (10⁻¹²-unit integer sums — [[knnIvfPqDet]]'s exact
    * arithmetic), shortlist `rerank` by `(score DESC, id)`, exact
    * rerank via point fetches of the shortlisted unit vectors, final
    * top-k. Bit-identical to [[knnIvfPqDet]] end to end.
    *
    * @note scale: hot memory = codes (m bytes-ish/vector) + books +
    *   centroids; the unit-vector map stands in for the cold
    *   point-fetch store (a KV store / the `unit/` files in a real
    *   deployment — only `rerank` lookups per query touch it). The
    *   `maxIndexRows` cap fails loudly; shard the id space past it. */
  def knnLookupIvfPq(queries: DataFrame, path: String, nprobe: Int = 4,
      rerank: Int = 40, k: Int = 10, idCol: String = "vec_id",
      vecCol: String = "embedding", maxIndexRows: Long = 1000000L): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cid").cast("long"), col("cv"), col("cnrm"))
      .as[(Long, Seq[Double], Double)].collect()
      .map(c => (c._1, c._2.toArray, c._3)).sortBy(_._1)
    val cellOf = spark.read.parquet(s"$path/cellOf")
      .select(col("cid").cast("long"), col("vec_id").cast("long"))
      .as[(Long, Long)].collect()
    require(cellOf.length <= maxIndexRows,
      s"saved index holds ${cellOf.length} vectors — beyond the in-memory " +
        s"serving cap ($maxIndexRows); shard the id space across serving jobs")
    val members: Map[Long, Array[Long]] =
      cellOf.groupBy(_._1).map { case (cid, rs) => cid -> rs.map(_._2).sorted }
    val bookRows = spark.read.parquet(s"$path/books")
      .select(col("j").cast("int"), col("c").cast("int"), col("cv"))
      .as[(Int, Int, Seq[Double])].collect()
    val mSub = bookRows.map(_._1).max + 1
    val kC = bookRows.map(_._2).max + 1
    val books = Array.ofDim[Array[Double]](mSub, kC)
    bookRows.foreach { case (j, c, cv) => books(j)(c) = cv.toArray }
    val codes: Map[Long, Array[Int]] = spark.read.parquet(s"$path/codes")
      .select(col("vec_id").cast("long"), col("j").cast("int"),
        col("c").cast("int"))
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        val arr = new Array[Int](mSub)
        rs.foreach { case (_, j, c) => arr(j) = c }
        id -> arr
      }
    val unit: Map[Long, Array[Double]] = spark.read.parquet(s"$path/unit")
      .select(col("vec_id").cast("long"), col("uv"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, uv) => id -> uv.toArray }.toMap
    val bc = spark.sparkContext.broadcast((cents, members, books, codes, unit))
    val np = math.min(nprobe, cents.length)
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    normed(queries, idCol, vecCol)
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { it =>
        val (cen, mem, bks, cds, uni) = bc.value
        val sub = bks(0)(0).length
        it.flatMap { case (qid, qvSeq, qn) =>
          val qv = qvSeq.toArray
          // probe routing on the RAW vector — detProbes' arithmetic
          val probed = cen.map { case (cid, cv, cnrm) =>
            val mm = math.min(qv.length, cv.length)
            var s = 0.0
            var j = 0
            while (j < mm) { s += qv(j) * cv(j); j += 1 }
            (s / (qn * cnrm), cid)
          }.sortBy { case (c0, cid) => (-c0, cid) }.take(np).map(_._2)
          // the query's unit vector + per-(subspace, code) ADC table,
          // quantized to 10⁻¹² units — detAdcTable's arithmetic
          val uq = qv.map(_ / qn)
          val t12 = Array.ofDim[Long](bks.length, bks(0).length)
          var j = 0
          while (j < bks.length) {
            var c = 0
            while (c < bks(j).length) {
              val cv = bks(j)(c)
              var s = 0.0
              var i = 0
              while (i < sub) { s += uq(j * sub + i) * cv(i); i += 1 }
              t12(j)(c) = java.math.BigDecimal.valueOf(s * 1.0e12)
                .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue.toLong
              c += 1
            }
            j += 1
          }
          // ADC over the probed cells' codes — exact integer sums
          var adc = Vector.empty[(Double, Long)]
          def trimTo(b: Vector[(Double, Long)], kk: Int) =
            if (b.length <= kk) b
            else b.sortBy { case (s, id) => (-s, id) }.take(kk)
          probed.foreach { cid =>
            mem.getOrElse(cid, Array.empty[Long]).foreach { nid =>
              if (nid != qid) {
                val code = cds(nid)
                var sumL = 0L
                var jj = 0
                while (jj < code.length) { sumL += t12(jj)(code(jj)); jj += 1 }
                adc = adc :+ ((r6(sumL.toDouble / 1.0e12), nid))
                if (adc.length >= 4 * rerank) adc = trimTo(adc, rerank)
              }
            }
          }
          // exact rerank of the shortlist via unit-vector point fetches
          val short = trimTo(adc, rerank).sortBy { case (s, id) => (-s, id) }
          val exact = short.map { case (_, nid) =>
            val nv = uni(nid)
            val mm = math.min(nv.length, uq.length)
            var s = 0.0
            var i = 0
            while (i < mm) { s += nv(i) * uq(i); i += 1 }
            (r6(s), nid)
          }
          exact.sortBy { case (s, id) => (-s, id) }.take(k)
            .iterator.zipWithIndex
            .map { case ((c0, nid), r) => (qid, nid, c0, r + 1) }
        }
      }
      .toDF("qid", "nbr", "cos", "rk")
      .withColumn("rk", col("rk").cast("int"))
  }

  /** HYBRID retrieval — lexical + dense arms fused by Reciprocal Rank
    * Fusion (Cormack, Clarke & Buettcher, SIGIR'09: `Σ 1/(c + rank)`,
    * the standard zero-tuning fusion every hybrid-search stack
    * ships): for each query id, the text arm ranks the corpus by
    * exact n-gram Jaccard against the query's document and the dense
    * arm by exact cosine against its embedding ([[knnCosine]]'s
    * arithmetic); the top `kText`/`kVec` of each arm full-outer-merge
    * on the candidate id and re-rank by
    * `round(1/(c+rk_text) + 1/(c+rk_vec), 6)` (each term one IEEE
    * division, summed in a fixed order — cross-engine exact, which is
    * what lets the `llm_hybrid_rrf` oracle rebuild BOTH arms and the
    * fusion in SQL). A doc found by only one arm keeps that arm's
    * term — RRF's native missing-rank handling. Returns
    * `(qid, nbr, rrf, rk)`.
    *
    * @note scale: both arms rank through the partial top-k aggregate
    *   (no window over the scored mass); the text arm here scores
    *   query×corpus exactly — at 100 TB generate its candidates with
    *   [[graft.operators.DedupOps.jaccardPairsComplete]] /
    *   the banded LSH and feed the same fusion; the dense arm routes
    *   through the IVF serving tier. The fusion itself touches only
    *   kText + kVec rows per query. */
  def hybridRrf(docs: DataFrame, emb: DataFrame, queryIds: Seq[Long],
      kText: Int = 20, kVec: Int = 20, k: Int = 10, c: Int = 60,
      docIdCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(queryIds.nonEmpty, "need at least one query id")
    val hs = graft.operators.DedupOps.hashedShingles(docs, docIdCol, textCol)
    val sets = hs.groupBy("doc_id")
      .agg(collect_list(col("h")).as("xs"), count(lit(1)).as("n"))
    val qsets = sets.filter(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("qid"), col("xs").as("qxs"), col("n").as("qn"))
    val scoredT = sets.crossJoin(broadcast(qsets))
      .filter(col("doc_id") =!= col("qid"))
      .withColumn("cc", size(array_intersect(col("xs"), col("qxs"))).cast("double"))
      .filter(col("cc") > 0)
      .withColumn("jac", round(col("cc") / (col("qn") + col("n") - col("cc")), 6))
      .select(col("qid"), col("doc_id").as("nbr"), col("jac"))
    val textTop = topKScored(scoredT, kText, "jac")
      .select(col("qid"), col("nbr"), col("rk").as("rk_t"))
    val vecTop = knnCosine(emb, col("vec_id").isin(queryIds: _*), kVec,
        vecIdCol, vecCol)
      .select(col("qid"), col("nbr"), col("rk").as("rk_v"))
    val fused = textTop.join(vecTop, Seq("qid", "nbr"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("rk_t")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rk_v")), lit(0.0)), 6))
      .select(col("qid"), col("nbr"), col("rrf"))
    topKScored(fused, k, "rrf")
  }

  /** Lloyd-refined coarse cells over the normalized working set —
    * shared by [[knnIvfKmeans]] and [[knnIvfPq]]. */
  private def trainCells(
      typed: org.apache.spark.sql.Dataset[(Long, Seq[Double], Double)],
      nCells: Int, refineIters: Int): Array[(Long, Array[Double], Double)] = {
    val spark = typed.sparkSession
    import spark.implicits._
    // Seeds: the nCells lowest ids. An id-hash SPREAD was tried and
    // measured strictly worse on both fixtures (RecallProbe: 0.46/0.68
    // vs 0.84/1.00) — Lloyd refinement recovers distribution shape from
    // any deterministic seed, and low-id seeds keep the probe recall
    // bound reproducible.
    var cents = typed.orderBy("vec_id").limit(nCells).collect()
      .map { case (id, v, nr) => (id, v.toArray, nr) }
    for (_ <- 1 to refineIters if cents.nonEmpty) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = typed.mapPartitions { it =>
        val cs = bc.value
        val sums = new Array[Array[Double]](cs.length)
        val cnts = new Array[Long](cs.length)
        it.foreach { case (_, vSeq, nr) =>
          val v = vSeq.toArray
          val best = nearestCell(cs, v, nr)
          if (sums(best) == null) sums(best) = new Array[Double](v.length)
          val s = sums(best)
          var i = 0
          val m = math.min(v.length, s.length)
          while (i < m) { s(i) += v(i); i += 1 }
          cnts(best) += 1
        }
        Iterator.range(0, cs.length).filter(sums(_) != null)
          .map(ix => (cs(ix)._1, cnts(ix), sums(ix).toSeq))
      }.collect()
      cents = partials.groupBy(_._1).toArray.sortBy(_._1).map {
        case (cid, rows) =>
          val dim = rows.head._3.length
          val s = new Array[Double](dim)
          var c = 0L
          rows.foreach { case (_, cnt, sv) =>
            c += cnt
            var i = 0
            while (i < dim) { s(i) += sv(i); i += 1 }
          }
          var i = 0
          while (i < dim) { s(i) /= c; i += 1 }
          var d = 0.0
          i = 0
          while (i < dim) { d += s(i) * s(i); i += 1 }
          (cid, s, math.sqrt(d))
      }.filter(_._3 > 0)
    }
    cents
  }

  /** Product-quantization kNN with ADC scoring — the memory-compression
    * scale path for similarity search: each normalized vector is stored
    * as `m` small code indices (one byte each at kCodes ≤ 256) instead
    * of `dim` doubles, an 8·dim/m× compression that lets a 100 TB
    * embedding corpus fit a cluster's memory for scanning. Codebooks
    * (per-subspace k-means, driver-held Lloyd exactly like
    * [[knnIvfKmeans]]) are metadata-sized: m·kCodes·(dim/m) doubles.
    *
    * Scoring is asymmetric distance computation: per query ONE
    * m×kCodes table of exact subspace dot products, then each corpus
    * vector's approximate cosine is m table lookups — no float multiply
    * per candidate. Returns `(qid, nbr, score, rk)`; `score` is the
    * quantized cosine, so this is approximate by design (rows-only key;
    * recall gated in `SimilaritySpec`). Combine with [[knnIvf]] cells
    * (IVF-PQ) when even the compressed scan is too wide.
    *
    * @note scale: training = `refineIters` narrow passes (partials →
    *   driver, corpus-size-independent); encoding = one narrow pass;
    *   scoring = one narrow pass against broadcast query tables + the
    *   per-query top-k window. Queries are broadcast-sized by contract,
    *   as everywhere in this module. */
  /** @param rerank 0 = pure ADC ranking; n > 0 = exact-rescore the top
    *   n ADC candidates per query (the standard PQ-then-rerank
    *   deployment: the compressed scan prunes the corpus to n rows, the
    *   exact pass touches only those). Output score column is then the
    *   exact cosine rounded to 6, directly comparable to [[knnCosine]]. */
  def knnPq(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      m: Int = 8, kCodes: Int = 16, refineIters: Int = 2, k: Int = 10,
      rerank: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val unit = toUnit(normedTyped(df, idCol, vecCol))
    val books = trainBooks(unit, m, kCodes, refineIters)
    val sub = books(0)(0).length
    val bcB = spark.sparkContext.broadcast(books)
    val encoded = unit.mapPartitions { it =>
      val bks = bcB.value
      val sd = bks(0)(0).length
      it.map { case (id, vSeq) =>
        val v = vSeq.toArray
        (id, Array.tabulate(bks.length)(j => nearestCode(bks(j), v, j * sd)).toSeq)
      }
    }.toDF("vec_id", "codes").as[(Long, Seq[Int])]
    val qtabs = unit.filter(isQuery).collect().map { case (qid, qv) =>
      (qid, adcTable(books, qv.toArray, sub))
    }
    val bcQ = spark.sparkContext.broadcast(qtabs)
    val adc = encoded.mapPartitions { it =>
      val qs = bcQ.value
      it.flatMap { case (id, codes) =>
        val cs = codes.toArray
        qs.iterator.filter(_._1 != id).map { case (qid, tab) =>
          (qid, id, adcScore(tab, cs))
        }
      }
    }.toDF("qid", "nbr", "score")
    rankShortlist(adc, unit, isQuery, k, rerank)
  }

  /** IVF-PQ: coarse cells prune the scan to nprobe/nCells of the
    * corpus, PQ codes compress what remains to m bytes per vector, ADC
    * scores the survivors, and (optionally) an exact pass re-ranks the
    * shortlist — the full production ANN stack, each stage independently
    * verified (cells: [[knnIvfKmeans]] + the probe-all oracle key;
    * codes: [[knnPq]] recall gates).
    *
    * @note scale: training and encoding are the same narrow
    *   driver-held-metadata passes as the component ops; scoring
    *   touches nprobe/nCells of the compressed corpus. Memory per
    *   scanned vector: m bytes + cell id. */
  def knnIvfPq(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      nCells: Int = 16, cellIters: Int = 2, nprobe: Int = 4,
      m: Int = 8, kCodes: Int = 16, pqIters: Int = 2, k: Int = 10,
      rerank: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = normedTyped(df, idCol, vecCol)
    val cells = trainCells(typed, nCells, cellIters)
    val unit = toUnit(typed)
    val books = trainBooks(unit, m, kCodes, pqIters)
    val sub = books(0)(0).length
    val bcC = spark.sparkContext.broadcast(cells)
    val bcB = spark.sparkContext.broadcast(books)
    // one narrow pass: cell assignment + PQ encoding (unit norm = 1)
    val encoded = unit.mapPartitions { it =>
      val cs = bcC.value
      val bks = bcB.value
      val sd = bks(0)(0).length
      it.map { case (id, vSeq) =>
        val v = vSeq.toArray
        (id, cs(nearestCell(cs, v, 1.0))._1,
          Array.tabulate(bks.length)(j => nearestCode(bks(j), v, j * sd)).toSeq)
      }
    }.toDF("vec_id", "cid", "codes").as[(Long, Long, Seq[Int])]
    val np = math.min(nprobe, cells.length)
    val qinfo = unit.filter(isQuery).collect().map { case (qid, qvSeq) =>
      val qv = qvSeq.toArray
      val probed = cells.map { case (cid, cv, cn) =>
        val mm = math.min(qv.length, cv.length)
        var s = 0.0
        var i = 0
        while (i < mm) { s += qv(i) * cv(i); i += 1 }
        (cid, s / cn)
      }.sortBy { case (cid, c) => (-c, cid) }.take(np).map(_._1).toSet
      (qid, probed, adcTable(books, qv, sub))
    }
    val bcQ = spark.sparkContext.broadcast(qinfo)
    val adc = encoded.mapPartitions { it =>
      val qs = bcQ.value
      it.flatMap { case (id, cid, codes) =>
        val cs = codes.toArray
        qs.iterator
          .filter { case (qid, probed, _) => qid != id && probed.contains(cid) }
          .map { case (qid, _, tab) => (qid, id, adcScore(tab, cs)) }
      }
    }.toDF("qid", "nbr", "score")
    rankShortlist(adc, unit, isQuery, k, rerank)
  }

  /** IVF cells over SQ8-quantized lists — the production vector-store
    * layout: coarse centroids prune the corpus to `nprobe` cells, the
    * scan inside the probed cells runs on int8 codes (4× smaller than
    * float32, 8× smaller than the double working form), and the exact
    * pass re-ranks only the per-query `shortlist`. Composes the
    * [[knnIvf]] routing with the [[knnSq8]] storage tier — the scan
    * arithmetic and shortlist/re-rank contract are identical to
    * [[knnSq8]], so the quantization error characteristics carry over
    * unchanged; only the candidate set shrinks from "whole corpus" to
    * "probed cells".
    *
    * @note scale: what you persist per corpus row is (cid, int8 codes,
    *   one scale double) — the float vector is fetched only for the
    *   shortlist rows (here kept alongside; in a real store it lives in
    *   a separate column family keyed by id). Routing + encoding are
    *   narrow passes against broadcast centroids; the only shuffle is
    *   the per-query top-k window. */
  def knnIvfSq8(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      nCells: Int = 16, cellIters: Int = 2, nprobe: Int = 4,
      shortlist: Int = 40, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = normedTyped(df, idCol, vecCol)
    val cells = trainCells(typed, nCells, cellIters)
    if (cells.isEmpty)
      return spark.emptyDataset[(Long, Long, Double, Int)]
        .toDF("qid", "nbr", "cos", "rk")
    val bc = spark.sparkContext.broadcast(cells)
    // one narrow pass: cell routing; the SQ8 encode is the same
    // declarative form as knnSq8 (int8 codes + per-vector scale)
    val assigned = typed.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, vSeq, nr) =>
        (id, vSeq, nr, cs(nearestCell(cs, vSeq.toArray, nr))._1)
      }
    }.toDF("vec_id", "v", "nrm", "cid")
    val q8 = assigned
      .withColumn("s", greatest(expr("array_max(transform(v, x -> abs(x)))"),
        lit(1e-12)) / 127.0)
      .withColumn("q", expr("transform(v, x -> CAST(round(x / s) AS TINYINT))"))
      .withColumn("qd", expr("transform(q, x -> CAST(x AS DOUBLE))"))
    val np = math.min(nprobe, cells.length)
    val probes = typed.filter(isQuery).mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (qid, vSeq, qn) =>
        val qv = vSeq.toArray
        cs.map { case (cid, cv, cn) =>
          val m = math.min(qv.length, cv.length)
          var s = 0.0
          var i = 0
          while (i < m) { s += qv(i) * cv(i); i += 1 }
          (cid, s / (qn * cn))
        }.sortBy { case (cid, c) => (-c, cid) }.take(np)
          .map { case (cid, _) => (qid, vSeq, qn, cid) }
      }
    }.toDF("qid", "qv", "qn", "cid")
      .withColumn("qs", greatest(expr("array_max(transform(qv, x -> abs(x)))"),
        lit(1e-12)) / 127.0)
      .withColumn("qqd",
        expr("transform(qv, x -> CAST(CAST(round(x / qs) AS TINYINT) AS DOUBLE))"))
    val shortIds = topKScored(
      q8.join(broadcast(probes), "cid")
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("approx",
          col("s") * col("qs") * expr("vec_dot(qd, qqd)") / (col("nrm") * col("qn")))
        .select(col("qid"), col("vec_id").as("nbr"), col("approx")),
      shortlist, "approx").select("qid", "nbr")
    // shortlist fetch against the full-vector tier (typed is cached),
    // then the final exact-ordered top-k through the partial aggregate
    val qside = typed.filter(isQuery)
      .toDF("qid", "qv", "qn").select("qid", "qv", "qn")
    val exact = typed.toDF("nbr", "nv", "nn")
      .join(broadcast(shortIds), "nbr")
      .join(broadcast(qside), "qid")
      .withColumn("cos", round(expr("vec_dot(nv, qv)") / (col("nn") * col("qn")), 6))
      .select(col("qid"), col("nbr"), col("cos"))
    topKScored(exact, k, "cos")
  }

  /** [[knnIvfSq8]] with DETERMINISTIC, oracle-rebuildable cell
    * training — the last ANN tier to get a hash-verified twin of its
    * own composed stack: [[knnIvfDet]]'s exact-BIGINT Lloyd cells
    * (lowest-id seeds, `(cos DESC, cid)` assignment, 10⁻⁹-unit
    * re-centering) route the probes, the in-cell scan runs on the
    * [[knnSq8]] int8 storage tier (per-vector scale + `round(x/s)`
    * codes; the approximate dot is a sum of EXACT small-integer
    * products, so it is partition-order-free), and the exact pass
    * re-ranks only the per-query `shortlist`. Every step is
    * arithmetic DuckDB replicates exactly, so the `llm_knn_ivfsq8_det`
    * oracle rebuilds train → assign → quantize → probe → shortlist →
    * rerank end to end and hash-checks shortlist membership itself;
    * the float-Lloyd [[knnIvfSq8]] stays the rows-only speed path.
    *
    * @note scale: same shape as [[knnIvfSq8]] — broadcast centroids
    *   route, int8 codes bound the in-cell scan bytes (4× under
    *   float32), and the float tier is touched only for
    *   shortlist×queries rows. */
  def knnIvfSq8Det(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      nCells: Int = 16, iters: Int = 2, nprobe: Int = 4,
      shortlist: Int = 40, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = normed(df, idCol, vecCol).persist()
    val cents = detTrainCells(n, nCells, iters)
    // storage tier over the det-assigned corpus: int8 codes + scale
    val q8 = detAssignCells(n, cents)
      .withColumn("s", greatest(expr("array_max(transform(v, x -> abs(x)))"),
        lit(1e-12)) / 127.0)
      .withColumn("qd",
        expr("transform(v, x -> CAST(CAST(round(x / s) AS TINYINT) AS DOUBLE))"))
    val probes = detProbes(n, cents, isQuery, math.min(nprobe, nCells))
      .withColumn("qs", greatest(expr("array_max(transform(qv, x -> abs(x)))"),
        lit(1e-12)) / 127.0)
      .withColumn("qqd",
        expr("transform(qv, x -> CAST(CAST(round(x / qs) AS TINYINT) AS DOUBLE))"))
    val shortIds = topKScored(
      q8.join(broadcast(probes), "cid")
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("approx",
          col("s") * col("qs") * expr("vec_dot(qd, qqd)") / (col("nrm") * col("qn")))
        .select(col("qid"), col("vec_id").as("nbr"), col("approx")),
      shortlist, "approx").select("qid", "nbr")
    val qside = n.filter(isQuery).select(col("vec_id").as("qid"),
      col("v").as("qv"), col("nrm").as("qn"))
    val exact = n.select(col("vec_id").as("nbr"), col("v").as("nv"),
        col("nrm").as("nn"))
      .join(broadcast(shortIds), "nbr")
      .join(broadcast(qside), "qid")
      .withColumn("cos", round(expr("vec_dot(nv, qv)") / (col("nn") * col("qn")), 6))
      .select(col("qid"), col("nbr"), col("cos"))
    topKScored(exact, k, "cos")
  }

  /** Per-stratum per-dimension mean embedding — the corpus centroid
    * table used for domain-mixture analysis and drift monitoring:
    * `(stratum, pos, mean)`.
    *
    * Determinism: float addition isn't associative, so a naive grouped
    * SUM depends on partitioning. Decimal casts are unsafe here — raw
    * float32 elements have short mantissas, so rounding them at any
    * fixed decimal scale hits exact-tie cases where engines' tie rules
    * differ. Instead each group gathers its values ORDERED BY the id
    * and folds left-to-right — bit-identical on any partitioning and
    * any engine with an ordered list fold.
    *
    * @note scale: the ordered gather holds one stratum×dimension group
    *   in memory (#docs-per-stratum doubles) — fine for centroid
    *   tables; for web-scale strata switch to the decimal-sum path and
    *   document the quantization instead. */
  def meanEmbedding(df: DataFrame, strataCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(strataCol).as("stratum"), col(idCol).as("id"),
        posexplode(transform(col(vecCol), x => x.cast("double"))))
      .groupBy(col("stratum"), col("pos"))
      .agg(sort_array(collect_list(struct(col("id"), col("col")))).as("xs"),
        count(lit(1)).as("n"))
      .select(col("stratum"), col("pos"),
        round(expr("aggregate(xs, 0D, (a, s) -> a + s.col)") / col("n"), 6)
          .as("mean"))

  /** Random-hyperplane-LSH near-duplicate pairs — the beyond-broadcast
    * scale path for [[cosineNearDups]]: vectors bucket by a
    * `nPlanes`-bit signature (sign of the projection onto fixed
    * pseudo-random ±1 hyperplanes), BANDED like MinHash-LSH: the bits
    * split into `nPlanes/bandBits` bands and a pair becomes a candidate
    * if it matches on ANY band — a pair at angle θ matches one band
    * with probability (1−θ/π)^bandBits, so banding turns "all bits
    * agree" (vanishing recall at moderate cosine) into a high-recall
    * OR. Candidates are verified with the exact cosine, so precision is
    * exact; recall is the tunable.
    *
    * Determinism by construction: projections are computed on
    * micro-unit QUANTIZED components (round(x·1e6) as int64) with ±1
    * integer weights derived from (plane, dim) by fixed arithmetic —
    * integer sums are order-independent, so the signature (and hence
    * the bucketing and the output) is identical on any partitioning and
    * any engine. No float enters until the exact-cosine verify, which
    * reuses the fold both engines share.
    *
    * @note scale: two shuffles (signature agg, bucket self-join); the
    *   all-pairs work is confined to one bucket, and a hot bucket
    *   AQE-skew-splits. Recall on planted near-dups is spec-gated
    *   against the exact kernel. */
  def rhpNearDups(df: DataFrame, minCosine: Double, nPlanes: Int = 16,
      bandBits: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = normed(df, idCol, vecCol).persist()
    val proj = n
      .select(col("vec_id"), posexplode(col("v")).as(Seq("d", "x")))
      .withColumn("x_u", round(col("x") * 1000000).cast("long"))
      .withColumn("p", explode(sequence(lit(0), lit(nPlanes - 1))))
      .withColumn("w",
        when(pmod((col("p") * 1009 + col("d")) * lit(2654435761L), lit(97)) < 48,
          lit(1L)).otherwise(lit(-1L)))
      .groupBy("vec_id", "p").agg(sum(col("w") * col("x_u")).as("s"))
    val bands = proj
      .withColumn("band", (col("p") / bandBits).cast("int"))
      .groupBy("vec_id", "band")
      .agg(sum(when(col("s") >= 0,
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p % $bandBits AS INT))"))
        .otherwise(lit(0L))).as("bsig"))
      .persist() // both sides of the band self-join
    val cands = bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") &&
        col("a.bsig") === col("b.bsig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ai"), col("b.vec_id").as("bi")).distinct()
    val a = n.select(col("vec_id").as("ai"), col("v").as("av"), col("nrm").as("an"))
    val b = n.select(col("vec_id").as("bi"), col("v").as("bv"), col("nrm").as("bn"))
    cands.join(a, "ai").join(b, "bi")
      .withColumn("cos", round(expr("vec_dot(av, bv)") / (col("an") * col("bn")), 6))
      .filter(col("cos") > minCosine)
      .select("ai", "bi", "cos")
  }

  /** Normalized vectors on the unit sphere (dot == cosine), cached. */
  private def toUnit(
      typed: org.apache.spark.sql.Dataset[(Long, Seq[Double], Double)]):
      org.apache.spark.sql.Dataset[(Long, Seq[Double])] = {
    val spark = typed.sparkSession
    import spark.implicits._
    typed.map { case (id, v, nr) => (id, v.map(_ / nr)) }
      .toDF("vec_id", "v").as[(Long, Seq[Double])].persist()
  }

  /** Per-subspace k-means codebooks over the unit working set —
    * driver-held Lloyd with the same structure and seeding policy as
    * [[trainCells]]; empty clusters keep their previous centroid. */
  private def trainBooks(
      unit: org.apache.spark.sql.Dataset[(Long, Seq[Double])],
      m: Int, kCodes: Int, refineIters: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && kCodes >= 1 && kCodes <= 256)
    val spark = unit.sparkSession
    import spark.implicits._
    val dim = unit.head()._2.length
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val seeds = unit.orderBy("vec_id").limit(kCodes).collect().map(_._2.toArray)
    var books: Array[Array[Array[Double]]] = Array.tabulate(m)(j =>
      seeds.map(_.slice(j * sub, (j + 1) * sub)))
    for (_ <- 1 to refineIters) {
      val bc = spark.sparkContext.broadcast(books)
      val partials = unit.mapPartitions { it =>
        val bks = bc.value
        val mm = bks.length
        val kc = bks(0).length
        val sd = bks(0)(0).length
        val sums = Array.ofDim[Double](mm, kc, sd)
        val cnts = Array.ofDim[Long](mm, kc)
        it.foreach { case (_, vSeq) =>
          val v = vSeq.toArray
          var j = 0
          while (j < mm) {
            val c = nearestCode(bks(j), v, j * sd)
            val s = sums(j)(c)
            var i = 0
            while (i < sd) { s(i) += v(j * sd + i); i += 1 }
            cnts(j)(c) += 1
            j += 1
          }
        }
        Iterator.range(0, mm).flatMap(j => Iterator.range(0, kc)
          .filter(c => cnts(j)(c) > 0)
          .map(c => ((j, c), (cnts(j)(c), sums(j)(c).toSeq))))
      }.collect()
      val merged = partials.groupBy(_._1).map { case ((j, c), rows) =>
        val s = new Array[Double](sub)
        var n = 0L
        rows.foreach { case (_, (cnt, sv)) =>
          n += cnt
          var i = 0
          while (i < sub) { s(i) += sv(i); i += 1 }
        }
        var i = 0
        while (i < sub) { s(i) /= n; i += 1 }
        (j, c, s)
      }
      val next = books.map(_.clone())
      merged.foreach { case (j, c, s) => next(j)(c) = s }
      books = next
    }
    books
  }

  /** Exact subspace dot products of a query against every code. */
  private def adcTable(books: Array[Array[Array[Double]]], qv: Array[Double],
      sub: Int): Array[Array[Double]] =
    Array.tabulate(books.length, books(0).length) { (j, c) =>
      val cv = books(j)(c)
      var s = 0.0
      var i = 0
      while (i < sub) { s += cv(i) * qv(j * sub + i); i += 1 }
      s
    }

  /** Quantized cosine: m table lookups, rounded to 6. */
  private def adcScore(tab: Array[Array[Double]], codes: Array[Int]): Double = {
    var s = 0.0
    var j = 0
    while (j < codes.length) { s += tab(j)(codes(j)); j += 1 }
    math.rint(s * 1e6) / 1e6
  }

  /** Top-k of an approximate score table, optionally exact-rescoring
    * the top `rerank` candidates per query first. */
  private def rankShortlist(adc: DataFrame,
      unit: org.apache.spark.sql.Dataset[(Long, Seq[Double])],
      isQuery: org.apache.spark.sql.Column, k: Int, rerank: Int): DataFrame =
    if (rerank <= 0) topKScored(adc, k, "score")
    else {
      // exact rescoring of the ADC shortlist: nq·rerank rows join back
      // to the corpus on the id — a broadcast-sized probe side
      val short = topKScored(adc, rerank, "score").select("qid", "nbr")
      val qvecs = broadcast(unit.filter(isQuery)
        .toDF("qid", "qv").select(col("qid"), col("qv")))
      val exact = unit.toDF("nbr", "nv").join(broadcast(short), "nbr").join(qvecs, "qid")
        .withColumn("score", round(expr("vec_dot(nv, qv)"), 6))
        .select(col("qid"), col("nbr"), col("score"))
      topKScored(exact, k, "score")
    }

  /** Index of the code with minimum L2 distance to the subvector of
    * `v` starting at `off`; ties keep the lowest code index. */
  private def nearestCode(codes: Array[Array[Double]], v: Array[Double],
      off: Int): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < codes.length) {
      val cv = codes(c)
      var d = 0.0
      var i = 0
      while (i < cv.length) {
        val x = v(off + i) - cv(i)
        d += x * x
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Normalized working set as a cached typed Dataset — the IVF paths
    * scan it once per Lloyd pass plus twice at probe time, so it earns
    * its cache; Spark's cache manager dedupes by canonicalized plan, so
    * repeated calls over the same input share one copy. */
  private def normedTyped(df: DataFrame, idCol: String, vecCol: String):
      org.apache.spark.sql.Dataset[(Long, Seq[Double], Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    normed(df, idCol, vecCol).as[(Long, Seq[Double], Double)].persist()
  }

  /** Index of the centroid with max cosine to `v`; ties keep the first
    * (lowest cid — callers keep `cs` sorted by cid ascending), matching
    * the declarative `ORDER BY cos DESC, cid` tie-break. */
  private def nearestCell(cs: Array[(Long, Array[Double], Double)],
      v: Array[Double], nr: Double): Int = {
    var best = 0
    var bestCos = Double.NegativeInfinity
    var ci = 0
    while (ci < cs.length) {
      val cv = cs(ci)._2
      val m = math.min(v.length, cv.length)
      var s = 0.0
      var i = 0
      while (i < m) { s += v(i) * cv(i); i += 1 }
      val c = s / (nr * cs(ci)._3)
      if (c > bestCos) { bestCos = c; best = ci }
      ci += 1
    }
    best
  }

  /** Shared IVF probe path: assign corpus rows to cells and route each
    * query to its `nprobe` nearest cells — both narrow passes against
    * the broadcast centroid array — then scan only the probed cells.
    * The one shuffle left is the per-query top-k window. */
  private def probeCells(
      typed: org.apache.spark.sql.Dataset[(Long, Seq[Double], Double)],
      cents: Array[(Long, Array[Double], Double)],
      isQuery: org.apache.spark.sql.Column, nprobe: Int, k: Int): DataFrame = {
    val spark = typed.sparkSession
    import spark.implicits._
    if (cents.isEmpty)
      return spark.emptyDataset[(Long, Long, Double, Int)]
        .toDF("qid", "nbr", "cos", "rk")
    val bc = spark.sparkContext.broadcast(cents)
    val assigned = typed.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, vSeq, nr) =>
        (id, vSeq, nr, cs(nearestCell(cs, vSeq.toArray, nr))._1)
      }
    }.toDF("vec_id", "v", "nrm", "cid")
    val np = math.min(nprobe, cents.length)
    val probes = typed.filter(isQuery).mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (qid, vSeq, qn) =>
        val qv = vSeq.toArray
        cs.map { case (cid, cv, cn) =>
          val m = math.min(qv.length, cv.length)
          var s = 0.0
          var i = 0
          while (i < m) { s += qv(i) * cv(i); i += 1 }
          (cid, s / (qn * cn))
        }.sortBy { case (cid, c) => (-c, cid) }.take(np)
          .map { case (cid, _) => (qid, vSeq, qn, cid) }
      }
    }.toDF("qid", "qv", "qn", "cid")
    val scored = assigned.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(expr("vec_dot(v, qv)") / (col("nrm") * col("qn")), 6))
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"))
    topKScored(scored, k, "cos")
  }
}
