package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Exact top-k cosine neighbors for the query rows selected by
    * `isQuery`: `(qid, nbr, cos, rk)`.
    * @note scale: broadcasts the query set, linear-scans the partitioned
    *   corpus — no corpus shuffle; this is the in-cell kernel of
    *   [[knnIvf]]. */
  def knnCosine(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      k: Int = 10, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val n = normed(df, idCol, vecCol)
    val q = n.filter(isQuery)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    n.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(expr("vec_dot(v, qv)") / (col("nrm") * col("qn")), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"), col("rk").cast("int").as("rk"))
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
    * @note scale: the broadcast side is N·dim·8 bytes (a 10M-vector,
    *   128-dim corpus ≈ 10 GB — beyond that, shard the broadcast side
    *   into S id-range slices and union the S kernel passes, or route
    *   through [[knnIvf]]-style cells / LSH banding; the per-partition
    *   loop itself is embarrassingly parallel and shuffle-free). */
  def cosineNearDups(df: DataFrame, minCosine: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = normed(df, idCol, vecCol)
      .select("vec_id", "v", "nrm").as[(Long, Seq[Double], Double)]
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
    *   one cell (no dedup pass). */
  def cosineNearDupsBlocked(df: DataFrame, minCosine: Double, nBlocks: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
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
    *   cells are the partitioning key, so a probe is a pruned partition
    *   scan, not a full shuffle. */
  def knnIvf(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      isCentroid: org.apache.spark.sql.Column, nprobe: Int = 4, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = normed(df, idCol, vecCol)
    val cents = n.filter(isCentroid)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    knnIvfWith(n, cents, isQuery, nprobe, k)
  }

  /** [[knnIvf]] with Lloyd-refined centroids: seeds are the `nCells`
    * lowest-id vectors (deterministic), then `refineIters` passes each
    * assign every vector to its nearest centroid and replace centroids
    * with the per-cell mean (one [[graft.functions.SketchAggregators.VecMean]]
    * shuffle per pass — a fixed-width buffer per cell, no dim-explode).
    * Refined centroids track the data distribution instead of whatever
    * the first `nCells` vectors happened to be, so probes recall more
    * true neighbors at the same nprobe.
    * @note scale: each pass is one broadcast (centroids) + one shuffle
    *   (cell sums); k-means|| seeding drops in here if the corpus is
    *   adversarial, without changing the probe path. */
  def knnIvfKmeans(df: DataFrame, isQuery: org.apache.spark.sql.Column,
      nCells: Int = 16, refineIters: Int = 2, nprobe: Int = 4, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val vecMean = udaf(graft.functions.SketchAggregators.VecMean,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    val n = normed(df, idCol, vecCol)
    var cents = n.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    for (_ <- 1 to refineIters) {
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
      cents = n.crossJoin(broadcast(cents))
        .withColumn("ccos", expr("vec_dot(v, cv)") / (col("nrm") * col("cn")))
        .withColumn("crk", row_number().over(wAssign)).filter(col("crk") === 1)
        .groupBy(col("cid")).agg(vecMean(col("v")).as("cv"))
        .withColumn("cn", sqrt(expr("vec_dot(cv, cv)")))
        .filter(col("cn") > 0)
    }
    knnIvfWith(n, cents, isQuery, nprobe, k)
  }

  /** Shared IVF probe path: assign corpus to cells, route each query to
    * its `nprobe` nearest cells, scan those cells only. */
  private def knnIvfWith(n: DataFrame, cents0: DataFrame,
      isQuery: org.apache.spark.sql.Column, nprobe: Int, k: Int): DataFrame = {
    val cents = cents0
    def cosTo(v: String, nrm: String, cv: String, cn: String) =
      expr(s"vec_dot($v, $cv)") / (col(nrm) * col(cn))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val assigned = n.crossJoin(broadcast(cents))
      .withColumn("ccos", cosTo("v", "nrm", "cv", "cn"))
      .withColumn("crk", row_number().over(wAssign)).filter(col("crk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
    val q = n.filter(isQuery)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("qcos", cosTo("qv", "qn", "cv", "cn"))
      .withColumn("prk", row_number().over(wProbe)).filter(col("prk") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), "cid").filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(cosTo("v", "nrm", "qv", "qn"), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vec_id").as("nbr"), col("cos"), col("rk").cast("int").as("rk"))
  }
}
