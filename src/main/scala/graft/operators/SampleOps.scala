package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling — the training-mixture primitives. A sample
  * used to assemble a corpus must be REPRODUCIBLE: membership decided
  * by a pure function of the row id, never an RNG, so re-running the
  * pipeline, resharding the data, or re-expressing the query in another
  * engine yields the identical sample (the oracle regression-tests
  * exactly that cross-engine claim).
  *
  * @note scale: both ops are narrow — a filter on a per-row hash (plus
  *   one broadcast of the metadata-sized rates table for the mixture);
  *   no shuffle, no driver state, fully codegen'd arithmetic.
  */
object SampleOps {

  private val M = 2147483648L // 2^31
  private val Knuth = 2654435761L // Knuth multiplicative constant

  /** `h(id) ∈ [0, 2^31)`: multiplicative hash with engine-portable
    * arithmetic — operands stay below 2^62, so no BIGINT overflow in
    * engines that error on wrap (DuckDB) and no wrap in engines that
    * don't (Spark). */
  def idHash(id: Column, salt: Long = 0L): Column =
    pmod(pmod(id, lit(M)) * lit(Knuth) + lit(salt), lit(M))

  /** DuckDB fragment computing [[idHash]] for a non-negative id. */
  def oIdHash(id: String, salt: Long = 0L): String =
    s"((($id % $M) * $Knuth + $salt) % $M)"

  /** Keep ~`rate` of rows, membership a pure function of the id. */
  def hashSample(df: DataFrame, rate: Double, idCol: String = "doc_id",
      salt: Long = 0L): DataFrame =
    df.filter(idHash(col(idCol), salt) < lit((rate * M).toLong))

  /** Stratified mixture sampling: `rates` is a metadata-sized
    * `(stratumCol, rate)` table — e.g. web 10%, books 80%, code 100% —
    * broadcast against the corpus; a stratum with no rate row drops
    * entirely. This is how a training mixture is reweighted without
    * materializing per-source copies. */
  def mixtureSample(df: DataFrame, rates: DataFrame,
      stratumCol: String = "source", idCol: String = "doc_id",
      salt: Long = 0L): DataFrame =
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(idHash(col(idCol), salt) <
        floor(col("rate") * lit(M.toDouble)).cast("long"))
      .drop("rate")

  /** Exactly-n-per-stratum sample: rank rows inside each stratum by the
    * deterministic id hash (id as tiebreak) and keep the first `n` —
    * the "give me 10k docs from every source" primitive, reproducible
    * across reruns, reshards, and engines like the rate-based ops.
    *
    * @note scale: one shuffle on the stratum key. A web-scale stratum
    *   makes that a skewed window; the two-phase fix is a rate-based
    *   [[hashSample]] pre-filter sized to ~3n expected survivors per
    *   stratum, then this exact rank on the survivors — same result,
    *   bounded partition size. */
  def stratifiedSample(df: DataFrame, n: Int, stratumCol: String = "source",
      idCol: String = "doc_id", salt: Long = 0L): DataFrame =
    df.withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol))
          .orderBy(idHash(col(idCol), salt), col(idCol))))
      .filter(col("__rk") <= n).drop("__rk")

  /** Weighted sampling WITHOUT replacement via priority sampling
    * (Duffield, Lund & Thorup, "Priority sampling for estimation of
    * arbitrary subset sums", JACM 2007): each row gets priority
    * `w · 2³¹ / (h(id)+1)` — the deterministic analogue of `w/u` for a
    * uniform `u ∈ (0,1]` — and the global top `n` priorities are the
    * sample. Heavier rows win proportionally more often, no row twice,
    * and the whole draw is a pure function of the ids, so any engine
    * re-running the recipe selects the identical rows.
    *
    * Determinism: the weight is scaled to exact micro-units
    * (`round(w·10⁶)` as BIGINT — so fractional weights like 0.9 keep
    * their proportional pull instead of truncating to zero), `h+1` is
    * an exact BIGINT, both int→double conversions are exact below 2⁵³
    * (w < 9·10⁹), and ONE IEEE double division is correctly rounded
    * identically everywhere — the priority is bit-exact cross-engine;
    * ties (equal w and h) break by id.
    *
    * @note scale: `ORDER BY priority DESC LIMIT n` executes as
    *   TakeOrdered — a per-partition k-heap plus one driver merge of
    *   partitions·n rows; no global sort, no full shuffle. */
  def prioritySample(df: DataFrame, n: Int, weightCol: Column,
      idCol: String = "doc_id", salt: Long = 0L): DataFrame =
    df.withColumn("priority",
        round(weightCol.cast("double") * lit(1000000L)).cast("long")
          .cast("double") /
          (idHash(col(idCol), salt) + lit(1L)).cast("double"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(n)

  /** Leakage-free GROUP-level train/val/test split: every row of a
    * group (source domain, site, author…) lands in the SAME split,
    * because the assignment hashes the GROUP key, not the row —
    * the standard guard against near-duplicate leakage across splits
    * (row-level splits put doc and near-dup on opposite sides and leak
    * eval into train). `splits` are `(label, fraction)`, fractions
    * summing to 1; assignment thresholds use exact micro-units of the
    * portable [[graft.functions.Hashes.polyHash]], so the split is a
    * pure engine-independent function of (group, salt).
    *
    * @note scale: one narrow projection — no shuffle, no group
    *   materialization; rebalancing or re-salting is a constant-time
    *   recipe change, not a data move. */
  def groupSplit(df: DataFrame, splits: Seq[(String, Double)],
      groupCol: String = "source", salt: String = "#split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val cum = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 1000000)
    }.tail
    val bucket = pmod(
      graft.functions.Hashes.polyHash(concat(col(groupCol), lit(salt))),
      lit(1000000L))
    val assign = splits.zip(cum).init.foldRight(
      lit(splits.last._1): Column) { case (((label, _), hi), rest) =>
      when(bucket < lit(hi), lit(label)).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /** DuckDB fragment for [[groupSplit]]'s bucket. */
  def oGroupBucket(group: String, salt: String = "#split"): String =
    s"(${graft.functions.Hashes.oPolyHash(s"$group || '$salt'")} % 1000000)"

  /** DuckDB fragment computing [[prioritySample]]'s priority (the same
    * exact micro-unit weight scaling as the operator). */
  def oPriority(w: String, id: String, salt: Long = 0L): String =
    s"(CAST(CAST(round(CAST($w AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)" +
      s" / CAST(${oIdHash(id, salt)} + 1 AS DOUBLE))"

  /** Temperature-scaled mixture resampling (default τ = 0.5) — the standard
    * training-mixture reweighting: stratum weights ∝ n^τ flatten the
    * natural distribution (τ=1 keeps it, τ=0 is uniform), so
    * low-resource sources are upsampled relative to their mass. With
    * τ = 0.5 the per-stratum keep-rate is
    * `min(1, targetFrac·N / Σ√n_j · √n_i / n_i)`, which preserves the
    * expected total at `targetFrac·N` (modulo the min-1 clamp).
    *
    * τ is restricted to QUARTER powers {0.25, 0.5, 0.75, 1.0} (0.75
    * is the common multilingual-sampling temperature): each weight is
    * then a product of nested `sqrt`s — every factor IEEE correctly
    * rounded — so Spark and any other engine compute bit-identical
    * rates and the hash-membership sample is cross-engine exact. A
    * general `pow(n, τ)` is NOT correctly rounded (SURVEY §8: engines
    * differ in the last ulp) and would poison exact reproducibility
    * for the sake of a parameter.
    * The cross-stratum weight sum is an ORDERED fold (strata sorted by
    * name), not a parallel SUM, for the same bit-exactness reason.
    *
    * @note scale: the counts/rates table is strata-sized (metadata);
    *   the corpus pass is the same narrow broadcast-join + hash filter
    *   as [[mixtureSample]]. One aggregation shuffle over the corpus
    *   for the counts. */
  def temperatureMixture(df: DataFrame, targetFrac: Double,
      stratumCol: String = "source", idCol: String = "doc_id",
      salt: Long = 0L, tau: Double = 0.5): DataFrame = {
    // n^tau for tau in {0.25, 0.5, 0.75, 1}: products of nested sqrts —
    // every factor is IEEE correctly rounded, so the rate is bit-exact
    // cross-engine. General pow is rejected by design (see scaladoc).
    require(Set(0.25, 0.5, 0.75, 1.0).contains(tau),
      s"tau=$tau unsupported: only quarter powers (0.25, 0.5, 0.75, 1.0) " +
        "have correctly-rounded cross-engine arithmetic")
    def wPow(nd: org.apache.spark.sql.Column): org.apache.spark.sql.Column = tau match {
      case 0.25 => sqrt(sqrt(nd))
      case 0.5 => sqrt(nd)
      case 0.75 => sqrt(nd) * sqrt(sqrt(nd))
      case _ => nd
    }
    val wSql = tau match {
      case 0.25 => "sqrt(sqrt(x.nd))"
      case 0.5 => "sqrt(x.nd)"
      case 0.75 => "sqrt(x.nd) * sqrt(sqrt(x.nd))"
      case _ => "x.nd"
    }
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n"))
    val tot = counts
      .agg(sort_array(collect_list(struct(col(stratumCol).as("s"),
          col("n").cast("double").as("nd")))).as("xs"),
        sum(col("n")).cast("double").as("bigN"))
      .select(col("bigN"),
        expr(s"aggregate(xs, 0D, (a, x) -> a + $wSql)").as("W"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate",
        least(lit(1.0), lit(targetFrac) * col("bigN") / col("W")
          * wPow(col("n").cast("double")) / col("n").cast("double")))
      .select(col(stratumCol), col("rate"))
    mixtureSample(df, rates, stratumCol, idCol, salt)
  }

  /** Domain-reweighting plan — the mixing table a training-data
    * pipeline derives before export (the input DoReMi-style domain
    * weights are applied with): given a per-stratum raw weight, compute
    * each stratum's actual token share and the sampling plan that hits
    * the target share at constant total budget — whole repeat `epochs`
    * plus a fractional remainder to subsample. `epochs` > 1 means the
    * domain is upsampled (repeated), 0 means it is cut to `frac`.
    *
    * All arithmetic is integer (micro-units, floor division), so the
    * plan is bit-identical cross-engine: for stratum s with weight w,
    * tokens n — `epochs = ⌊w·T / (W·n)⌋`, `frac_u = ⌊10⁶·((w·T) mod
    * (W·n)) / (W·n)⌋` with T total tokens, W total weight.
    *
    * @note scale: one aggregation shuffle over the corpus for the
    *   per-stratum counts; the plan table is strata-sized metadata
    *   (broadcast one-row totals). Applying the plan is
    *   [[mixtureSample]] with `rate = epochs + frac` — repeats via a
    *   posexplode of `epochs`+1 copies hash-gated per copy. */
  def domainMixPlan(df: DataFrame, wRaw: Column, stratumCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val per = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tok"))
      .withColumn("w", wRaw.cast("long"))
    val tot = per.agg(sum("n_tok").as("total_tok"), sum("w").as("w_tot"))
    per.crossJoin(broadcast(tot))
      .select(col("stratum").as(stratumCol), col("n_docs"), col("n_tok"),
        expr("(1000000 * n_tok) div total_tok").cast("long").as("share_u"),
        expr("(1000000 * w) div w_tot").cast("long").as("weight_u"),
        expr("(w * total_tok) div (w_tot * n_tok)").cast("long").as("epochs"),
        expr("(1000000 * ((w * total_tok) % (w_tot * n_tok))) div (w_tot * n_tok)")
          .cast("long").as("frac_u"))
  }

  /** Deterministic epoch shuffle — the "global shuffle before
    * training" export: every row gets a pseudo-random but REPRODUCIBLE
    * position `(shard, pos)` derived from `idHash(id, epoch)`, so an
    * epoch's read order is decided by (id, epoch) alone — rerunning,
    * resharding or re-deriving the corpus yields the identical order,
    * and a different epoch salt yields an independent one. Returns the
    * input plus `(shard, pos)`; pos is 1-based within the shard,
    * ordered by (hash, id).
    *
    * @note scale: one shuffle — rows hash-route to their shard and the
    *   in-shard rank rides that exchange's sort. The export form is
    *   `.repartition(nShards, col("shard")).sortWithinPartitions("pos")
    *   .write…` — shard files stream out pre-sorted with no extra
    *   exchange. No global sort: order is only ever defined WITHIN a
    *   shard, which is all a data loader consumes. */
  def epochShuffle(df: DataFrame, nShards: Int, epoch: Long = 0L,
      idCol: String = "doc_id"): DataFrame = {
    val h = idHash(col(idCol), epoch)
    df.withColumn("shard", pmod(h, lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(h, col(idCol))))
  }
}
