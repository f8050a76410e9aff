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

  /** Expectation validation ([[graft.operators.ProfileOps.rowChecks]] +
    * [[graft.operators.ProfileOps.fkOrphans]]): the Deequ-style quality
    * gate — domain, range, PK-uniqueness and FK-integrity checks as one
    * stacked `(check_name, n_bad)` report. Row checks share ONE scan
    * per table; the mix includes checks that fire (>0) and checks that
    * hold (0) so both outcomes are hash-pinned. */
  private val constraints = Q(
    "profile_constraints",
    """SELECT 'l_discount_le_8pct' AS check_name,
      |  CAST(count(CASE WHEN l_discount > 0.08 THEN 1 END) AS BIGINT) AS n_bad
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_orderkey_fk', CAST(count(*) AS BIGINT) FROM lineitem l
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |UNION ALL
      |SELECT 'o_custkey_fk', CAST(count(*) AS BIGINT) FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'o_pk_unique', CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
      |UNION ALL
      |SELECT 'o_status_domain',
      |  CAST(count(CASE WHEN o_orderstatus NOT IN ('P','O','F') THEN 1 END) AS BIGINT) FROM orders
      |UNION ALL
      |SELECT 'o_totalprice_cap_450k',
      |  CAST(count(CASE WHEN o_totalprice > 450000 THEN 1 END) AS BIGINT) FROM orders
      |ORDER BY check_name""".stripMargin) { (s, d) =>
    import graft.operators.ProfileOps
    val orders = Tables.orders(s, d)
    val rowRules = ProfileOps.rowChecks(orders, Seq(
      "o_status_domain" -> !col("o_orderstatus").isin("P", "O", "F"),
      "o_totalprice_cap_450k" -> (col("o_totalprice") > 450000)))
    val liRules = ProfileOps.rowChecks(Tables.lineitem(s, d), Seq(
      "l_discount_le_8pct" -> (col("l_discount") > 0.08)))
    val pkUnique = orders
      .agg((count(lit(1)) - count_distinct(col("o_orderkey")))
        .cast("long").as("n_bad"))
      .select(lit("o_pk_unique").as("check_name"), col("n_bad"))
    val fks =
      ProfileOps.fkOrphans("o_custkey_fk", orders, Tables.customer(s, d),
          "o_custkey", "c_custkey")
        .unionByName(ProfileOps.fkOrphans("l_orderkey_fk",
          Tables.lineitem(s, d), orders, "l_orderkey", "o_orderkey"))
    rowRules.unionByName(liRules).unionByName(pkUnique).unionByName(fks)
      .orderBy("check_name")
  }

  /** Semi-structured key census: parse the events' JSON payload as a
    * map and profile which keys appear with what frequency and numeric
    * mass — the discovery pass before promoting JSON fields to typed
    * columns. Spark parses once into a map (`from_json`) and explodes;
    * the oracle walks DuckDB's json_keys the same way.
    *
    * @note scale: one narrow parse+explode, one hash agg on the key —
    *   output is the number of DISTINCT keys, so the report stays tiny
    *   however wide the payloads get. */
  private val jsonKeys = Q(
    "profile_json_keys",
    """SELECT k, count(*) AS n,
      |  CAST(sum(CAST(json_extract(props, '$.'||k) AS BIGINT)) AS BIGINT) AS sum_v
      |FROM (SELECT unnest(json_keys(props)) AS k, props FROM events)
      |GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(explode(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))).as(Seq("k", "v")))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("k")
  }

  /** Corrupt-record tolerance: 1% of the JSON payloads are mangled
    * in-flight, the parse (`from_json`, PERMISSIVE by default) yields
    * NULL instead of failing the job, and the report counts parse
    * failures per event type while aggregating the valid remainder —
    * the "bad rows must not kill the pipeline" contract, hash-pinned.
    * The oracle reproduces the mangling predicate and the null-out. */
  private val corruptTolerant = Q(
    "profile_corrupt_tolerant",
    """SELECT event_type, count(*) AS n,
      |  CAST(count(CASE WHEN event_id % 100 = 0 THEN 1 END) AS BIGINT) AS n_bad,
      |  CAST(sum(CASE WHEN event_id % 100 <> 0
      |             THEN CAST(json_extract(props, '$.k') AS BIGINT) END) AS BIGINT) AS sum_v
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val mangled = when(col("event_id") % 100 === 0,
      concat(lit("NOT_JSON"), col("props"))).otherwise(col("props"))
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(mangled, org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType)).as("m"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("m").isNull, 1L).otherwise(0L)).as("n_bad"),
        sum(element_at(col("m"), "k")).as("sum_v"))
      .orderBy("event_type")
  }

  /** Exact higher moments (skewness + excess kurtosis per group) —
    * completes the moments family (count/mean/var → covar → corr →
    * skew/kurt), the drift-detection statistics a profiling pass
    * trends. Power sums Σx..Σx⁴ are EXACT decimal sums of integer
    * micro-units (x ≤ 5000 so x⁴ fits BIGINT per row; only the sum
    * needs decimal); the moment combination runs in double through ONE
    * portable SQL string executed verbatim by both engines, so every
    * IEEE operation — including the correctly-rounded sqrt — is
    * expression-identical. No pow(): `m2·sqrt(m2)` instead, because
    * pow is not correctly rounded and may differ across libm
    * implementations. */
  private val momentsSql: String =
    """WITH u AS (SELECT l_returnflag, CAST(round(l_quantity * 100) AS BIGINT) AS x FROM lineitem),
      |g AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
      |        CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |        CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS s2,
      |        CAST(sum(CAST(x * x * x AS DECIMAL(38,0))) AS DOUBLE) AS s3,
      |        CAST(sum(CAST(x * x * x * x AS DECIMAL(38,0))) AS DOUBLE) AS s4
      |      FROM u GROUP BY 1),
      |m AS (SELECT l_returnflag, n, s1 / n AS mu, s2, s3, s4 FROM g),
      |c AS (SELECT l_returnflag, n, mu,
      |        s2 / n - mu * mu AS m2,
      |        s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu AS m3,
      |        s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu AS m4
      |      FROM m)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n, round(mu / 100, 6) AS mean_q,
      |  round(m2 / 10000, 6) AS var_q,
      |  round(m3 / (m2 * sqrt(m2)), 6) AS skew_q,
      |  round(m4 / (m2 * m2) - 3, 6) AS kurt_q
      |FROM c ORDER BY l_returnflag""".stripMargin

  private val moments = Q("profile_moments", momentsSql) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(momentsSql)
  }

  /** Shuffle-key skew report ([[graft.operators.ProfileOps.keySkew]]):
    * the 10 heaviest l_partkey values with corpus share and
    * multiple-of-mean load — the pre-join diagnostic that decides
    * whether a key needs salting before a 100 TB shuffle. */
  private val skew = Q(
    "profile_skew",
    """WITH c AS (SELECT l_partkey AS skew_key, count(*) AS n FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS nkeys FROM c)
      |SELECT c.skew_key, CAST(c.n AS BIGINT) AS n,
      |  round(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share,
      |  round(CAST(c.n AS DOUBLE) * CAST(t.nkeys AS DOUBLE)
      |    / CAST(t.total AS DOUBLE), 4) AS x_mean
      |FROM c, t ORDER BY n DESC, skew_key LIMIT 10""".stripMargin) { (s, d) =>
    graft.operators.ProfileOps.keySkew(Tables.lineitem(s, d), "l_partkey", 10)
  }

  /** Per-source winsorized document length
    * ([[graft.operators.ProfileOps.winsorize]], p05/p95 rank-based
    * bounds): the outlier clamp applied before lengths feed sampling
    * weights. Integer in, integer out — zero float surface. */
  private val winsorize = Q(
    "llm_winsorize",
    """WITH r AS (SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM documents),
      |b AS (SELECT source,
      |    min(CASE WHEN rk = greatest(ceil(0.05 * n), 1) THEN n_chars END) AS lo,
      |    min(CASE WHEN rk = ceil(0.95 * n) THEN n_chars END) AS hi
      |  FROM r GROUP BY source)
      |SELECT d.doc_id, d.source, d.n_chars,
      |  least(greatest(d.n_chars, b.lo), b.hi) AS n_chars_w
      |FROM documents d JOIN b USING (source)
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    graft.operators.ProfileOps.winsorize(Tables.documents(s, d),
        valueCol = "n_chars", groupCol = "source", idCol = "doc_id")
      .select("doc_id", "source", "n_chars", "n_chars_w")
      .orderBy("doc_id")
  }

  /** MAD outliers ([[graft.operators.ProfileOps.madOutliers]], k=3):
    * documents whose length sits more than 3 median-absolute-deviations
    * from their source's median — the robust length gate; rank-based
    * medians keep the whole test integer-exact. */
  private val madOutliers = Q(
    "llm_mad_outliers",
    """WITH r AS (SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM documents),
      |m AS (SELECT source, min(CASE WHEN rk = ceil(0.5 * n) THEN n_chars END) AS med
      |  FROM r GROUP BY source),
      |d AS (SELECT doc_id, source, n_chars, med, abs(n_chars - med) AS dev
      |  FROM documents JOIN m USING (source)),
      |r2 AS (SELECT doc_id, source, dev,
      |    row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rk,
      |    count(*) OVER (PARTITION BY source) AS n FROM d),
      |m2 AS (SELECT source, min(CASE WHEN rk = ceil(0.5 * n) THEN dev END) AS mad
      |  FROM r2 GROUP BY source)
      |SELECT d.doc_id, d.source, d.n_chars, d.med, m2.mad, d.dev
      |FROM d JOIN m2 USING (source)
      |WHERE d.dev > 3 * m2.mad
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    graft.operators.ProfileOps.madOutliers(Tables.documents(s, d),
        valueCol = "n_chars", groupCol = "source", idCol = "doc_id")
      .select("doc_id", "source", "n_chars", "med", "mad", "dev")
      .orderBy("doc_id")
  }

  /** POPULATION STABILITY INDEX between two epochs of the event
    * stream ([[graft.operators.ProfileOps.psi]]) — the drift gate a
    * training pipeline runs before trusting a new data batch: fixed
    * 50-unit bins of `value` (last open-ended), reference = even
    * event_ids, current = odd (a deterministic epoch split), PSI per
    * event_type with the standard 1e-6 probability floor for
    * one-side-empty bins. The oracle restates the one-pass
    * conditional-count + total-join + ln fold directly. */
  private val profilePsi = Q(
    "profile_psi",
    """WITH b AS (SELECT event_type,
      |    CAST(least(floor(value / 50), 9) AS INT) AS bin,
      |    CAST(event_id % 2 AS INT) AS side FROM events),
      |c AS (SELECT event_type, bin,
      |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(sum(CASE WHEN side != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM b GROUP BY 1, 2),
      |t AS (SELECT event_type, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
      |  FROM c GROUP BY 1),
      |j AS (SELECT c.event_type, t_ref, t_cur,
      |    greatest(CAST(n_ref AS DOUBLE) / t_ref, 1e-6) AS pr,
      |    greatest(CAST(n_cur AS DOUBLE) / t_cur, 1e-6) AS pc
      |  FROM c JOIN t USING (event_type))
      |SELECT event_type, CAST(max(t_ref) AS BIGINT) AS n_ref,
      |  CAST(max(t_cur) AS BIGINT) AS n_cur,
      |  round(sum((pc - pr) * ln(pc / pr)), 6) AS psi
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    graft.operators.ProfileOps.psi(Tables.events(s, d),
        valueCol = col("value"), sideCol = col("event_id") % 2,
        groupCols = Seq("event_type"), width = 50.0, maxBin = 9)
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(histogram, profile, quantileBins, constraints,
    jsonKeys, corruptTolerant, moments, skew, winsorize, madOutliers,
    profilePsi)
}
