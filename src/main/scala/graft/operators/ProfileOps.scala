package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — the "look before you train" pass over a new
  * source. Pure aggregates: one partial+final hash agg per call, no
  * driver state, any corpus size.
  */
object ProfileOps {

  /** Fixed-width histogram of a numeric column: `(bin, n, mass)` with
    * `bin = min(floor(value / width), maxBin)` — the last bin is
    * open-ended so outliers can't explode the bin count. */
  def histogram(df: DataFrame, valueCol: Column, width: Double,
      maxBin: Int): DataFrame = {
    require(width > 0 && maxBin >= 0)
    df.groupBy(least(floor(valueCol / width), lit(maxBin))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(valueCol).as("mass"))
      .orderBy("bin")
  }

  /** Per-group winsorization: clamp `valueCol` to its group's
    * [pLo, pHi] quantiles — the outlier-taming transform applied to
    * document lengths / quality scores before they feed sampling
    * weights. Bounds are RANK-BASED (the value at row `ceil(p·n)` of
    * the sorted group — discrete, no interpolation), so for integer
    * inputs every bound and every output is an exact integer and the
    * whole op is float-free and engine-exact.
    *
    * Rank fine print: `p·n` is IEEE double arithmetic, so at exact
    * decimal multiples the product can land a hair ABOVE the integer
    * (0.05·100 = 5.000000000000001) and `ceil` then selects the NEXT
    * rank (6, not 5). This is deterministic and identical on every
    * IEEE engine (the oracle recomputes it bit-for-bit; the spec pins
    * rank 6 for that case) — the contract is "ceil of the IEEE
    * product", not the real-number rank.
    *
    * @note scale: one window pass (rank + count share a partitioning)
    *   plus a conditional aggregate to a #groups-row bounds table that
    *   broadcast-joins back — no second shuffle of the data. Skewed
    *   groups: the rank window sorts within each group; for a web-scale
    *   group pre-aggregate to (group, value, count) first. */
  def winsorize(df: DataFrame, valueCol: String, groupCol: String,
      idCol: String, pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo > 0 && pHi < 1 && pLo < pHi)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))
    val ranked = df
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
    val bounds = ranked.groupBy(col(groupCol))
      .agg(
        min(when(col("__rk") === greatest(ceil(lit(pLo) * col("__n")), lit(1L)),
          col(valueCol))).as("__lo"),
        min(when(col("__rk") === ceil(lit(pHi) * col("__n")),
          col(valueCol))).as("__hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Robust outlier detection via MEDIAN ABSOLUTE DEVIATION: a row is
    * an outlier when `|x − median| > k · MAD` — the robust alternative
    * to z-scores (one extreme value drags a mean+stddev gate, but not
    * the median pair). Both medians are RANK-BASED (value at
    * `ceil(n/2)` of the sorted group), so for integer inputs the whole
    * test is integer-exact end to end — no float surface at all
    * (`0.5·n` is even exact in binary). Returns the outlier rows with
    * `(…, med, mad, dev)` attached.
    *
    * @note scale: two window/agg rounds on the same group partitioning
    *   plus two broadcast joins of #groups-row tables — the data
    *   shuffles once. Same skewed-group remark as [[winsorize]]. */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
      idCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def medOf(in: DataFrame, vCol: String, outName: String): DataFrame = {
      val w = Window.partitionBy(col(groupCol)).orderBy(col(vCol), col(idCol))
      in.withColumn("__rk", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          Window.partitionBy(col(groupCol))))
        .groupBy(col(groupCol))
        .agg(min(when(col("__rk") === ceil(lit(0.5) * col("__n")),
          col(vCol))).as(outName))
    }
    val med = medOf(df, valueCol, "med")
    val withDev = df.join(broadcast(med), groupCol)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = medOf(withDev, "dev", "mad")
    withDev.join(broadcast(mad), groupCol)
      .filter(col("dev") > lit(k.toLong) * col("mad"))
  }

  /** Stacked per-column summary — one row per profiled column with
    * `(col_name, n, n_null, n_distinct, mn, mx)`; the long shape keeps
    * the schema fixed however many columns are profiled. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    cols.map { c =>
      df.agg(count(lit(1)).as("n"),
          sum(when(col(c).isNull, 1).otherwise(0)).as("n_null"),
          count_distinct(col(c)).as("n_distinct"),
          round(min(col(c)), 6).as("mn"), round(max(col(c)), 6).as("mx"))
        .withColumn("col_name", lit(c))
        .select("col_name", "n", "n_null", "n_distinct", "mn", "mx")
    }.reduce(_ unionByName _).orderBy("col_name")
  }

  /** Expectation validation, the Deequ-style quality gate: each check
    * is `(name, bad-row predicate)`; returns one `(check_name, n_bad)`
    * row per check. ALL checks evaluate in ONE scan — a single global
    * aggregate of conditional counters, then a stack to the long shape —
    * so adding a check is free at 100 TB (no extra pass per
    * expectation). Cross-table rules (FK orphans) are [[fkOrphans]].
    *
    * A violation COUNT rather than a boolean: pipelines gate on
    * thresholds ("< 0.1% bad rows"), and the count is what you alert
    * on, log, and trend. */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty)
    // coalesce so an EMPTY input reports 0 violations per check (sum
    // over zero rows is NULL, which would make an `n_bad == 0` gate
    // depend on null handling). Counters carry positional aliases and
    // user-supplied names flow only through lit(), never through SQL
    // text or identifier parsing — a quote/backtick in a check name is
    // data, not syntax.
    val counters = checks.zipWithIndex.map { case ((_, bad), i) =>
      coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"c_$i") }
    val agged = df.agg(counters.head, counters.tail: _*)
    val pairs = checks.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("check_name"), col(s"c_$i").as("n_bad")) }
    agged.select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.check_name"), col("kv.n_bad"))
  }

  /** Shuffle-key skew profile: the `k` heaviest values of `keyCol`
    * with count, corpus share, and multiple-of-mean-key-load — the
    * "which key do I salt" diagnostic run BEFORE a big join or
    * aggregation ships 100 TB through a shuffle. `x_mean` ≫ 1 on the
    * top key means that key's reducer finishes that many times later
    * than the average one (the straggler); feed such keys to an
    * explicit salt or let AQE skew-split them.
    *
    * @note scale: one hash agg on the key (partial+final), one global
    *   one-row agg broadcast back, and a TakeOrderedAndProject for the
    *   top-k — no full sort, no driver-side collection beyond k rows.
    *   Deterministic under ties via the key tiebreak. */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k > 0)
    val c = df.groupBy(col(keyCol).as("skew_key")).agg(count(lit(1)).as("n"))
    val t = c.agg(sum(col("n")).as("total"), count(lit(1)).as("nkeys"))
    c.crossJoin(broadcast(t))
      .select(col("skew_key"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6).as("share"),
        round(col("n").cast("double") * col("nkeys").cast("double")
          / col("total").cast("double"), 4).as("x_mean"))
      .orderBy(col("n").desc, col("skew_key"))
      .limit(k)
  }

  /** Referential-integrity check: child rows whose `childKey` has no
    * match in `parent.parentKey` — `(check_name, n_bad)`, one row.
    * @note scale: a LEFT ANTI join (shuffle or broadcast by size);
    *   null child keys count as orphans (a null FK violates too). */
  def fkOrphans(name: String, child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_bad"))
      .select(lit(name).as("check_name"), col("n_bad"))

  /** POPULATION STABILITY INDEX — the drift statistic a data pipeline
    * runs between a reference epoch and the current one before
    * trusting a new batch:
    * `PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)` over a fixed-
    * width binning of `valueCol` (last bin open-ended at `maxBin`),
    * computed per `groupCols` group. `sideCol = 0` marks the reference
    * slice, anything else the current; a bin empty on one side takes
    * the standard `minP` probability floor (ln(0) guard) — PSI's usual
    * smoothing, applied identically on both sides so a both-empty bin
    * contributes nothing. Returns
    * `(groupCols…, n_ref, n_cur, psi)` with psi rounded to 6.
    *
    * Rule of thumb (credit-scoring lineage): psi < 0.1 stable,
    * 0.1–0.25 moderate shift, > 0.25 investigate before training.
    *
    * @note scale: one hash aggregation over (group, bin) — both sides
    *   counted in ONE pass with conditional sums, never two scans —
    *   then a broadcast-sized per-group total join and a group-sized
    *   final fold. Bin count is a constant; everything is
    *   partial+final aggregation, no row explosion. */
  def psi(df: DataFrame, valueCol: Column, sideCol: Column,
      groupCols: Seq[String], width: Double, maxBin: Int,
      minP: Double = 1e-6): DataFrame = {
    require(width > 0 && maxBin >= 1, "need width > 0 and maxBin >= 1")
    val g = groupCols.map(col)
    val binned = df.select(g :+
      least(floor(valueCol / width), lit(maxBin)).cast("int").as("bin") :+
      sideCol.cast("int").as("side"): _*)
    val counts = binned.groupBy(g :+ col("bin"): _*).agg(
      sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("side") =!= 0, 1L).otherwise(0L)).as("n_cur"))
    val totals = counts.groupBy(g: _*).agg(
      sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    val pr = greatest(col("n_ref").cast("double") / col("t_ref"), lit(minP))
    val pc = greatest(col("n_cur").cast("double") / col("t_cur"), lit(minP))
    counts.join(totals, groupCols)
      .withColumn("term", (pc - pr) * log(pc / pr))
      .groupBy(g: _*)
      .agg(max(col("t_ref")).as("n_ref"), max(col("t_cur")).as("n_cur"),
        round(sum(col("term")), 6).as("psi"))
  }
}
