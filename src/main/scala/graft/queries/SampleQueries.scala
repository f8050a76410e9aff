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

  val all: Seq[Q] = Seq(sampleHash, sampleMixture, sampleStratified)
}
