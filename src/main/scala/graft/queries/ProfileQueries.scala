package graft.queries

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Data-profiling utilities — the "look before you train" pass a
  * pipeline runs over a new source: value histograms and per-column
  * summary statistics. Pure aggregates, so they scale as any hash agg
  * (partial+final, one shuffle) and DuckDB states them directly.
  */
object ProfileQueries {

  /** Fixed-width value histogram of l_extendedprice (11 bins, last one
    * open-ended) with count and mass per bin. */
  private val histogram = Q(
    "agg_histogram",
    s"""SELECT CAST(least(floor(l_extendedprice / 10000), 10) AS BIGINT) AS bin,
       |  count(*) AS n, ${Det.osum("l_extendedprice")} AS mass
       |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    graft.operators.ProfileOps.histogram(Tables.lineitem(s, d),
      col("l_extendedprice"), width = 10000, maxBin = 10)
  }

  /** Stacked per-column profile (rows: one per column): counts, nulls,
    * distincts, min/max. The stacked shape is what a profiling job
    * emits for arbitrarily many columns without widening the schema. */
  private val profile = Q(
    "profile_columns",
    (Seq("l_quantity", "l_discount", "l_tax").map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  round(min($c), 6) AS mn, round(max($c), 6) AS mx
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY col_name")) { (s, d) =>
    graft.operators.ProfileOps.columns(Tables.lineitem(s, d),
      Seq("l_quantity", "l_discount", "l_tax"))
  }

  /** Equal-frequency (quantile) binning — the feature-discretization
    * pass: customers cut into balance deciles via ntile over a TOTAL
    * order (unique custkey tiebreak makes the cut deterministic on both
    * engines), then per-bin population and range. The profile-side twin
    * of a Bucketizer fit.
    *
    * @note scale: a global ntile is a single-partition window — fine
    *   for profiling samples; at full 100 TB switch the cut points to
    *   approx_percentile and bin map-side with width_bucket, trading
    *   exact equal counts for a shuffle-free pass. */
  private val quantileBins = Q(
    "profile_quantile_bins",
    s"""WITH b AS (SELECT c_acctbal,
       |    ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS bin
       |  FROM customer)
       |SELECT bin, count(*) AS n, round(min(c_acctbal), 6) AS lo,
       |  round(max(c_acctbal), 6) AS hi
       |FROM b GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_acctbal"), ntile(10).over(w).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), round(min("c_acctbal"), 6).as("lo"),
        round(max("c_acctbal"), 6).as("hi"))
      .orderBy("bin")
  }

  val all: Seq[Q] = Seq(histogram, profile, quantileBins)
}
