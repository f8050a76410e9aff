package graft.queries

import graft.{Q, Tables}
import graft.operators.SampleOps
import org.apache.spark.sql.functions._

/** Deterministic-sampling keys (training-mixture assembly). The DuckDB
  * oracle recomputes the same id-hash arithmetic, so the checked claim
  * is exactly the property that matters in production: any engine
  * re-running the recipe selects the identical sample.
  */
object SampleQueries {

  private val sampleHash = Q(
    "llm_sample_hash",
    s"""SELECT doc_id, source FROM documents
       |WHERE ${SampleOps.oIdHash("doc_id")} < CAST(floor(0.35 * 2147483648) AS BIGINT)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    SampleOps.hashSample(Tables.documents(s, d), rate = 0.35)
      .select("doc_id", "source").orderBy("doc_id")
  }

  /** Mixture rates derived from the source id so the key needs no side
    * fixture: src<n> samples at ((n % 4) + 1) · 0.2 — 20/40/60/80%. */
  private val sampleMixture = Q(
    "llm_sample_mixture",
    s"""SELECT doc_id, source FROM documents
       |WHERE ${SampleOps.oIdHash("doc_id")} < CAST(floor(
       |  ((CAST(substr(source, 4) AS INT) % 4) + 1) * 0.2 * 2147483648.0) AS BIGINT)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val rates = docs.select("source").distinct()
      .withColumn("rate",
        ((expr("CAST(substring(source, 4) AS INT)") % 4 + 1) * lit(0.2)))
    SampleOps.mixtureSample(docs, rates)
      .select("doc_id", "source").orderBy("doc_id")
  }

  /** Exactly-40-per-source sample ([[SampleOps.stratifiedSample]]):
    * rank inside each stratum by the id hash, keep the first 40 — the
    * fixed-budget variant of mixture sampling. */
  private val sampleStratified = Q(
    "llm_sample_stratified",
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
       |    ORDER BY ${SampleOps.oIdHash("doc_id")}, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= 40 ORDER BY doc_id""".stripMargin) { (s, d) =>
    SampleOps.stratifiedSample(Tables.documents(s, d), n = 40)
      .select("doc_id", "source").orderBy("doc_id")
  }

  /** Temperature-τ=0.5 mixture resample ([[SampleOps.temperatureMixture]]):
    * per-source keep-rate `min(1, 0.5·N/Σ√n_j · √n_i/n_i)` — low-mass
    * sources upsampled relative to their share. Every float op in the
    * rate (sqrt, ·, /) is IEEE correctly-rounded and the Σ√n fold is
    * ordered by source on both engines, so membership is bit-exact
    * cross-engine. */
  private val sampleTemperature = Q(
    "llm_sample_temperature",
    s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS DOUBLE) AS bigN,
       |             list_sum(list_transform(list(CAST(n AS DOUBLE) ORDER BY source),
       |                                    x -> sqrt(x))) AS W
       |      FROM c),
       |r AS (SELECT source,
       |        least(1.0, 0.5 * bigN / W * sqrt(CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS rate
       |      FROM c CROSS JOIN t)
       |SELECT d.doc_id, d.source FROM documents d JOIN r USING (source)
       |WHERE ${SampleOps.oIdHash("d.doc_id")} < CAST(floor(rate * 2147483648.0) AS BIGINT)
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    SampleOps.temperatureMixture(Tables.documents(s, d), targetFrac = 0.5)
      .select("doc_id", "source").orderBy("doc_id")
  }

  /** Deterministic epoch shuffle ([[SampleOps.epochShuffle]]): the
    * (shard, pos) read-order assignment for one training epoch, a pure
    * function of (doc_id, epoch). */
  private val epochShuffle = Q(
    "llm_epoch_shuffle",
    s"""SELECT doc_id, shard, CAST(pos AS BIGINT) AS pos FROM (
       |  SELECT doc_id,
       |    CAST(${SampleOps.oIdHash("doc_id", 7)} % 8 AS INT) AS shard,
       |    row_number() OVER (PARTITION BY ${SampleOps.oIdHash("doc_id", 7)} % 8
       |      ORDER BY ${SampleOps.oIdHash("doc_id", 7)}, doc_id) AS pos
       |  FROM documents)
       |ORDER BY shard, pos""".stripMargin) { (s, d) =>
    SampleOps.epochShuffle(Tables.documents(s, d), nShards = 8, epoch = 7L)
      .select(col("doc_id"), col("shard"), col("pos").cast("long").as("pos"))
      .orderBy("shard", "pos")
  }

  /** Domain-reweighting plan ([[SampleOps.domainMixPlan]]): raw weight
    * `(source_index % 4) + 1` per source, integer micro-unit plan —
    * upsample epochs + fractional remainder at constant token budget. */
  private val domainMix = Q(
    "llm_domain_mix",
    """WITH per AS (SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok,
      |    CAST((CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4) + 1
      |      AS BIGINT) AS w
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total_tok,
      |               CAST(sum(w) AS BIGINT) AS w_tot FROM per)
      |SELECT source, n_docs, n_tok,
      |  CAST((1000000 * n_tok) // total_tok AS BIGINT) AS share_u,
      |  CAST((1000000 * w) // w_tot AS BIGINT) AS weight_u,
      |  CAST((w * total_tok) // (w_tot * n_tok) AS BIGINT) AS epochs,
      |  CAST((1000000 * ((w * total_tok) % (w_tot * n_tok)))
      |    // (w_tot * n_tok) AS BIGINT) AS frac_u
      |FROM per, tot ORDER BY source""".stripMargin) { (s, d) =>
    SampleOps.domainMixPlan(Tables.documents(s, d),
        wRaw = (regexp_extract(col("stratum"), "([0-9]+)", 1).cast("int") % 4) + 1)
      .orderBy("source")
  }

  /** Token-weighted sample without replacement ([[SampleOps.prioritySample]],
    * n=100, weight = token count): long documents are proportionally
    * likelier, no document twice, and the oracle recomputes the exact
    * priority arithmetic — the checked claim is that both engines draw
    * the IDENTICAL weighted sample. */
  private val sampleWeighted = Q(
    "llm_sample_weighted",
    s"""SELECT doc_id, source, n_tok, priority FROM (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    ${SampleOps.oPriority("len(string_split(text, ' '))", "doc_id")} AS priority
       |  FROM documents)
       |ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin) { (s, d) =>
    SampleOps.prioritySample(Tables.documents(s, d), n = 100,
        weightCol = size(split(col("text"), " ")))
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"), col("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
  }

  /** Leakage-free grouped train/val/test split
    * ([[SampleOps.groupSplit]], 80/10/10 by source): every document of
    * a source lands in the same split — the near-dup-leakage guard. The
    * oracle recomputes the group-hash bucket thresholds exactly. */
  private val groupSplit = Q(
    "llm_group_split",
    s"""SELECT doc_id, source,
       |  CASE WHEN ${SampleOps.oGroupBucket("source")} < 800000 THEN 'train'
       |       WHEN ${SampleOps.oGroupBucket("source")} < 900000 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    SampleOps.groupSplit(Tables.documents(s, d),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "source", "split").orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(sampleHash, sampleMixture, sampleStratified,
    sampleTemperature, epochShuffle, domainMix, sampleWeighted, groupSplit)
}
