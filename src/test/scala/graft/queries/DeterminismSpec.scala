package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The determinism-by-construction claim (SURVEY §8.3, SCALE.md ground
  * rules) under ACTUAL replanning: representative keys from every
  * determinism regime — exact-decimal sums, integer micro-units,
  * windows with total tiebreaks, iterative integer math, float
  * ordered-fold — must return byte-identical rows when the shuffle
  * partition count changes and AQE is disabled. On a 1000-executor
  * cluster these settings WILL differ run to run; a key that only
  * matches the oracle under one partitioning is wrong.
  */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val keys = Seq(
    "agg_pricing_summary",   // exact decimal additive aggregates
    "graph_pagerank",        // iterative integer micro-units
    "window_zscore_anomaly", // decimal window algebra
    "llm_embed_centroid",    // ordered gather + left fold floats
    "state_merge_intervals", // running-max window + agg
    "llm_sample_stratified", // hash-rank sampling
    "cdc_apply_changelog")   // anti-join + union merge

  private def run(key: String): Seq[String] =
    SparkEntry.queries(key)(spark, sf)
      .collect().toSeq.map(_.toSeq.mkString("|"))

  test("results are invariant to shuffle partition count and AQE") {
    val conf = spark.conf
    val p0 = conf.get("spark.sql.shuffle.partitions")
    val a0 = conf.get("spark.sql.adaptive.enabled", "true")
    val base = keys.map(k => k -> run(k)).toMap
    try {
      conf.set("spark.sql.shuffle.partitions", "7")
      conf.set("spark.sql.adaptive.enabled", "false")
      keys.foreach { k =>
        assert(run(k) == base(k), s"$k changed under replanning")
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", p0)
      conf.set("spark.sql.adaptive.enabled", a0)
    }
  }
}
