package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One step of an N-step CEP pattern (SURVEY §2.9 T8 generalized): the
  * events matching `predicate`, required to occur within `within` of the
  * previous MATCHED step. `optional` steps may be skipped — the next
  * step's bound then applies from the last matched step, exactly Flink
  * CEP's `optional()` with the NO_SKIP after-match strategy (every
  * combination is emitted: if the optional event exists, both the
  * with- and without- matches appear).
  */
final case class PatternStep(name: String, predicate: Column,
    within: String = "0 minutes", optional: Boolean = false)

/** General N-step sequence patterns over a keyed event stream —
  * subsumes the fixed 2-step `cep_sequence` and 3-step `cep_funnel3`
  * shapes (spec-asserted). Flink CEP's `begin/next/within/optional`
  * chain re-expressed as chained event-time interval joins, which is
  * the form Spark can both batch-plan and incrementally execute.
  */
object CepOps {

  /** All matches of `steps` over `ev`: one row per combination —
    * `(key, <name>_id per step (null when an optional step is
    * skipped), total_us)` where `total_us` spans first to last MATCHED
    * event. First and last step must be required (anchors).
    *
    * Works on batch and streaming frames alike: each step becomes one
    * equi-join on the key plus a time-band residual, so under
    * Structured Streaming (apply `withWatermark` to `ev` first) every
    * join's buffer evicts at the watermark horizon — a k-step pattern
    * is k-1 bounded-state joins, never a per-key history scan
    * (the same chain shape Spark supports for multi-stateful-operator
    * append queries).
    *
    * @note scale: shuffle is on the key at every join; each step's
    *   fan-out is bounded by events-per-key inside the time band. An
    *   optional step unions the skip branch (no extra shuffle — same
    *   partitioning) with the take branch.
    */
  def cepPattern(ev: DataFrame, keyCol: String, tsCol: String, idCol: String,
      steps: Seq[PatternStep]): DataFrame = {
    require(steps.size >= 2, "a pattern needs at least two steps")
    require(!steps.head.optional && !steps.last.optional,
      "first and last pattern steps must be required (they anchor the match)")
    val first = steps.head
    // first_ts is carried as epoch-µs BIGINT, not TimestampType: under
    // streaming the ts column is watermark-tagged, and duplicating it
    // would give the plan two event-time columns (Spark allows one per
    // stream). last_ts stays the single tagged column driving state
    // eviction in every downstream join.
    var acc = ev.filter(first.predicate).select(
      col(keyCol).as("k"),
      unix_micros(col(tsCol)).as("first_us"),
      col(tsCol).as("last_ts"),
      col(idCol).as(s"${first.name}_id"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val e = ev.filter(st.predicate).select(
        col(keyCol).as(s"k_$i"), col(tsCol).as(s"ts_$i"), col(idCol).as(s"id_$i"))
      val kept = acc.columns.filterNot(_ == "last_ts").map(col)
      val taken = acc.join(e,
          col("k") === col(s"k_$i") && col(s"ts_$i") > col("last_ts") &&
            col(s"ts_$i") <= col("last_ts") + expr(s"INTERVAL ${st.within}"))
        .select(kept :+ col(s"ts_$i").as("last_ts")
          :+ col(s"id_$i").as(s"${st.name}_id"): _*)
      acc =
        if (st.optional)
          acc.withColumn(s"${st.name}_id",
              lit(null).cast(taken.schema(s"${st.name}_id").dataType))
            .unionByName(taken)
        else taken
    }
    acc.select(col("k").as(keyCol)
      +: steps.map(s => col(s"${s.name}_id"))
      :+ (unix_micros(col("last_ts")) - col("first_us")).as("total_us"): _*)
  }

  /** Chains shorter than this skip the density pre-count entirely —
    * the measured cliff lives in the 5+-slot unrolled shapes
    * (4-slot chains finished in-band at 10× density; the 6-slot mixed
    * chain blew a 300 s budget), and skipping keeps every short key's
    * plan and job count byte-identical. */
  private val DensityGuardSlots = 5

  /** Interval string ("360 minutes", "12 hours", "2 days") → µs; None
    * when unparsable — the guard SKIPS rather than guesses. */
  private def intervalUs(s: String): Option[Long] = {
    val re = raw"(?i)\s*(\d+)\s+([A-Za-z]+)\s*".r
    s match {
      case re(n, u) =>
        (u.toLowerCase.stripSuffix("s") match {
          case "second" => Some(1000000L)
          case "minute" => Some(60000000L)
          case "hour"   => Some(3600000000L)
          case "day"    => Some(86400000000L)
          case _        => None
        }).map(n.toLong * _)
      case _ => None
    }
  }

  /** DENSITY GUARD for long unrolled chains: relaxed-contiguity
    * candidate growth is ~(band-fan-out)^slots, and the slot-count
    * caps (`times` m ≤ 8, `maxReps` ≤ 8) bound SLOTS, not DENSITY — a
    * hot key at 10× event density walked the measured 6-slot chain
    * past a 300 s budget while every 1× key stayed under a second. So
    * before building a ≥[[DensityGuardSlots]]-slot chain, ONE cheap
    * aggregation over `ev` (per-slot match counts, ~distinct keys,
    * time span) estimates the expected candidate-prefix mass under
    * uniform timing — `c₁ · Π (cᵢ/keys · band/span)`, maxed over
    * prefixes since intermediate joins pay it even when the full
    * chain filters down — and refuses loudly past `cap`, naming the
    * `within` band as the lever (band/10 measured returning the 10×
    * fixture to budget: BASELINE.md stress section). Calibration:
    * every shipped 1× chain estimates ≤ ~2·10⁴, the 10× 6-slot cliff
    * ~2·10⁸ — the 5·10⁶ default sits two orders from both.
    *
    * Construction-time side effect (like [[SimilarityOps.knnIvfSaved]]'s
    * probe collect, documented there too): building the frame runs one
    * small Spark job. Batch-only by nature — the streaming twins run
    * their own `maxPartials` guard per micro-batch instead. */
  private def densityGuard(ev: DataFrame, keyCol: String, tsCol: String,
      steps: Seq[AltStep], cap: Double): Unit = {
    val bands = steps.map(s => intervalUs(s.within))
    if (bands.exists(_.isEmpty)) return
    val counts = steps.zipWithIndex.map { case (s, i) =>
      val pred = s.branches.map(_._2).reduce(_ or _)
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(s"c_$i")
    }
    val aggs = counts ++ Seq(
      approx_count_distinct(col(keyCol)).as("k"),
      (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
        .as("span"))
    val row = ev.agg(aggs.head, aggs.tail: _*).head()
    if (row.isNullAt(row.fieldIndex("span"))) return // empty input
    val k = math.max(1L, row.getAs[Long]("k"))
    val span = math.max(1L, row.getAs[Long]("span"))
    var est = row.getAs[Long]("c_0").toDouble
    var mx = est
    steps.indices.drop(1).foreach { i =>
      val f = math.min(1.0, bands(i).get.toDouble / span)
      est *= row.getAs[Long](s"c_$i").toDouble / k * f
      mx = math.max(mx, est)
    }
    require(mx <= cap,
      f"cep chain density guard: ~$mx%.3g expected candidate prefixes " +
        f"across ${steps.size} slots exceed the supported $cap%.3g — " +
        "relaxed-contiguity growth is (band-fan-out)^slots and the " +
        "`within` band is the lever (band/10 measured returning the " +
        "10x-density fixture to budget); tighten `within`, lower the " +
        "repetition count, or split the pattern")
  }

  /** One slot of an alternation pattern ([[cepAlternation]]): the slot
    * matches when ANY of its named `branches` `(branchName, predicate)`
    * matches — Flink CEP's group-pattern alternation `(B | C)` WITH
    * branch identity preserved (a plain `where(predB.or(predC))` loses
    * which alternative fired; here multi-branch slots emit a
    * `<name>_branch` column carrying the branch name — the
    * `CLASSIFIER()` analogue). A single-branch slot is a plain step. */
  final case class AltStep(name: String, branches: Seq[(String, Column)],
      within: String = "0 minutes")

  /** All matches of an alternation sequence `A (B|C) D …` — each slot
    * compiled as a UNION of per-branch interval-join legs, so branch
    * identity survives into the output and an event satisfying BOTH
    * branch predicates yields one match per branch (regex alternation
    * semantics, not first-match-wins). Output: `(key, per slot
    * <name>_id [+ <name>_branch when multi-branch], total_us)`.
    *
    * Works on batch and streaming frames alike (watermark `ev` first):
    * every leg is the same keyed equi-join + time-band residual as
    * [[cepPattern]], and the per-slot union preserves the key
    * partitioning — an n-branch slot is n bounded-state joins feeding
    * one union, never a per-key history scan.
    *
    * @note scale: shuffle on the key per leg; fan-out bounded by
    *   events-per-key inside the band, summed over branches. Branch
    *   predicates are usually disjoint (distinct event types), so the
    *   legs partition the slot's input rather than multiply it. */
  def cepAlternation(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, steps: Seq[AltStep],
      maxChainEstimate: Double = 5e6): DataFrame = {
    if (steps.size >= DensityGuardSlots)
      densityGuard(ev, keyCol, tsCol, steps, maxChainEstimate)
    alternationImpl(ev, keyCol, tsCol, idCol, steps)
  }

  /** [[cepAlternation]] WITHOUT the density guard — the per-count
    * group kernels ([[cepGroupRange]], [[cepGroupKleene]], the
    * closed-range family) build m−n+1 near-identical chains whose slot
    * predicates repeat, so they run [[densityGuard]] ONCE on the
    * longest chain (its prefix mass dominates every shorter one) and
    * compile each count through this unguarded body instead of paying
    * one estimation scan of `ev` per count. */
  private def alternationImpl(ev: DataFrame, keyCol: String,
      tsCol: String, idCol: String, steps: Seq[AltStep]): DataFrame = {
    require(steps.size >= 2, "a pattern needs at least two slots")
    require(steps.forall(_.branches.nonEmpty), "every slot needs a branch")
    require(steps.map(_.name).distinct.size == steps.size,
      "slot names must be distinct (they name the output columns)")
    require(steps.forall(s =>
      s.branches.map(_._1).distinct.size == s.branches.size),
      "branch names must be distinct within a slot")
    val first = steps.head
    def seed(bn: String, pred: Column): DataFrame = {
      val base = ev.filter(pred).select(
        col(keyCol).as("k"),
        unix_micros(col(tsCol)).as("first_us"),
        col(tsCol).as("last_ts"),
        col(idCol).as(s"${first.name}_id"))
      if (first.branches.size > 1)
        base.withColumn(s"${first.name}_branch", lit(bn))
      else base
    }
    var acc = first.branches.map((seed _).tupled).reduce(_ unionByName _)
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val kept = acc.columns.filterNot(_ == "last_ts").map(col)
      def leg(bn: String, pred: Column): DataFrame = {
        val e = ev.filter(pred).select(col(keyCol).as(s"k_$i"),
          col(tsCol).as(s"ts_$i"), col(idCol).as(s"id_$i"))
        val taken = acc.join(e,
          col("k") === col(s"k_$i") && col(s"ts_$i") > col("last_ts") &&
            col(s"ts_$i") <= col("last_ts") + expr(s"INTERVAL ${st.within}"))
        val outCols = (kept :+ col(s"ts_$i").as("last_ts") :+
          col(s"id_$i").as(s"${st.name}_id")) ++
          (if (st.branches.size > 1) Seq(lit(bn).as(s"${st.name}_branch"))
           else Nil)
        taken.select(outCols: _*)
      }
      acc = st.branches.map((leg _).tupled).reduce(_ unionByName _)
    }
    acc.select(col("k").as(keyCol)
      +: steps.flatMap(s => col(s"${s.name}_id") +:
        (if (s.branches.size > 1) Seq(col(s"${s.name}_branch")) else Nil))
      :+ (unix_micros(col("last_ts")) - col("first_us")).as("total_us"): _*)
  }

  /** Group pattern with a FIXED repetition count — Flink's
    * `Pattern.begin(groupPattern).times(n)`, e.g. `(A B){2}` = A B A B:
    * the group's sub-steps unroll into one flat `n·|group|`-slot
    * sequence (relaxed contiguity between consecutive events, each
    * within `within` of the previous match — the same contract as
    * [[cepPattern]]) compiled on the [[cepAlternation]] chain. Output:
    * `(key, <step>_<rep>_id per slot, total_us)` — every bound event
    * survives into the match, so MEASURES over any repetition are
    * renames.
    *
    * @note scale: n·|group| keyed interval joins — a fixed-length
    *   chain, state bounded per join by the band; no per-key history
    *   scan. */
  def cepGroupTimes(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, group: Seq[(String, Column)], n: Int,
      within: String): DataFrame = {
    require(group.nonEmpty, "a group needs at least one step")
    require(n >= 1, s"times($n): need n >= 1")
    require(group.size * n >= 2, "a pattern needs at least two slots")
    require(group.map(_._1).distinct.size == group.size,
      "group step names must be distinct")
    cepAlternation(ev, keyCol, tsCol, idCol, groupSteps(group, n, within))
  }

  /** The unrolled flat slot chain of `(group){r}` — shared by every
    * group-quantifier compilation. */
  private def groupSteps(group: Seq[(String, Column)], r: Int,
      within: String): Seq[AltStep] =
    (1 to r).flatMap(rr => group.map { case (nm, p) =>
      AltStep(s"${nm}_$rr", Seq(s"${nm}_$rr" -> p), within) })

  /** Quantified sequence group with NAMED-ALTERNATION members —
    * `((B|C) D){n}`: each group member may itself be a branch set, so
    * the unrolled flat chain carries BRANCH IDENTITY per repetition
    * (`<member>_<rep>_branch` columns for multi-branch members — the
    * per-rep `CLASSIFIER()`). Unrolls exactly as [[cepGroupTimes]]
    * (relaxed contiguity, every event within `within` of the previous
    * match) onto the [[cepAlternation]] chain; a single-branch member
    * is a plain step.
    *
    * @note scale: `n·|group|` keyed interval joins, each slot a UNION
    *   of its branch legs — fixed-length bounded-state chain, branch
    *   legs usually partition the slot's input (disjoint predicates)
    *   rather than multiply it. */
  def cepGroupAlt(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, group: Seq[(String, Seq[(String, Column)])],
      n: Int, within: String): DataFrame = {
    require(group.nonEmpty, "a group needs at least one member")
    require(n >= 1, s"times($n): need n >= 1")
    require(group.size * n >= 2, "a pattern needs at least two slots")
    require(group.forall(_._2.nonEmpty), "every member needs a branch")
    require(group.map(_._1).distinct.size == group.size,
      "group member names must be distinct")
    require(group.exists(_._2.size > 1),
      "no multi-branch member — use cepGroupTimes for the plain form")
    val steps = (1 to n).flatMap(r => group.map { case (nm, branches) =>
      AltStep(s"${nm}_$r", branches, within) })
    cepAlternation(ev, keyCol, tsCol, idCol, steps)
  }

  /** MIXED group quantifier — a fixed-count sequence group embedded in
    * an outer sequence, Flink's
    * `begin(A).next(groupPattern.times(n)).next(D)`, e.g.
    * `A (B C){2} D` = A B C B C D: the group unrolls exactly as in
    * [[cepGroupTimes]] and the outer `pre`/`post` steps join the same
    * flat [[cepAlternation]] chain (relaxed contiguity, every event
    * within `within` of the previous match). Output:
    * `(key, <pre>_id …, <step>_<rep>_id …, <post>_id …, total_us)` —
    * every bound event survives, MEASURES over any position are
    * renames.
    *
    * Only the TIMES form mixes: `(B C)+ D` would multiply the
    * Kleene's per-repetition unions by the outer chain and is
    * rejected loudly where it is declared
    * ([[Pattern.group]]`.oneOrMore`, [[MatchRecognize]]).
    *
    * @note scale: `|pre| + n·|group| + |post|` keyed interval joins —
    *   the same fixed-length bounded-state chain as [[cepGroupTimes]];
    *   no per-key history scan. */
  def cepGroupTimesMixed(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, pre: Seq[(String, Column)],
      group: Seq[(String, Column)], n: Int,
      post: Seq[(String, Column)], within: String): DataFrame = {
    require(group.nonEmpty, "a group needs at least one step")
    require(n >= 1, s"times($n): need n >= 1")
    require(pre.nonEmpty || post.nonEmpty,
      "no outer steps — use cepGroupTimes for a standalone group")
    require(group.map(_._1).distinct.size == group.size,
      "group step names must be distinct")
    val unrolled = (1 to n).flatMap(r => group.map { case (nm, p) =>
      s"${nm}_$r" -> p })
    val names = pre.map(_._1) ++ unrolled.map(_._1) ++ post.map(_._1)
    require(names.distinct.size == names.size,
      s"outer step names must not collide with the unrolled group " +
        s"columns: $names")
    val steps = (pre ++ unrolled ++ post).map { case (nm, p) =>
      AltStep(nm, Seq(nm -> p), within) }
    cepAlternation(ev, keyCol, tsCol, idCol, steps)
  }

  /** Group pattern with a BOUNDED RANGE repetition count — Flink's
    * `Pattern.begin(groupPattern).times(n, m)`, e.g. `(A B){1,2}` =
    * `A B` or `A B A B`: one match PER repetition count in `n..m`
    * (the same per-count emission as [[cepGroupKleene]] — a run that
    * completes m repetitions also reports its n..m-1-rep prefixes),
    * compiled as the UNION of the [[cepGroupTimes]] expansions, with
    * every repetition's events bound as columns NULL-PADDED to the
    * m-shape (repetitions a shorter match did not reach are null —
    * the same contract as an unmatched `optional` step). Output:
    * `(key, <step>_<rep>_id for rep = 1..m, reps, total_us)`.
    *
    * `m` is a hard bound exactly like the Kleene's `maxReps` —
    * candidate matches multiply with per-step band fan-out at every
    * extra repetition, so the cap fails loudly instead of silently
    * truncating.
    *
    * @note scale: Σ r·|group| keyed interval joins over the unrolled
    *   chains (r = n..m) — each chain is [[cepGroupTimes]]'s bounded
    *   fixed-length shape, and the union preserves the key
    *   partitioning; no per-key history scan. */
  def cepGroupRange(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, group: Seq[(String, Column)], n: Int, m: Int,
      within: String): DataFrame = {
    require(group.nonEmpty, "a group needs at least one step")
    require(n >= 1 && m > n,
      s"times($n,$m): need 1 <= n < m — times(n) is the fixed-count form")
    require(m <= 8,
      s"times($n,$m) unrolls to m·|group| joined slots with " +
        s"band-fan-out^slots candidate growth; m=$m is outside the " +
        "supported 2..8 — tighten the bound or the `within` band")
    require(group.size * n >= 2, "a pattern needs at least two slots")
    require(group.map(_._1).distinct.size == group.size,
      "group step names must be distinct")
    // one guard on the longest chain — its prefix mass dominates every
    // shorter count (see alternationImpl)
    val longest = groupSteps(group, m, within)
    if (longest.size >= DensityGuardSlots)
      densityGuard(ev, keyCol, tsCol, longest, 5e6)
    val runs = (n to m).map { r =>
      val run = alternationImpl(ev, keyCol, tsCol, idCol,
        groupSteps(group, r, within))
      val idType = run.schema(s"${group.head._1}_1_id").dataType
      val padded = (r + 1 to m)
        .flatMap(rr => group.map { case (nm, _) => s"${nm}_${rr}_id" })
        .foldLeft(run)((d, c) => d.withColumn(c, lit(null).cast(idType)))
      padded.withColumn("reps", lit(r).cast("int"))
    }
    val outCols = col(keyCol) +:
      (1 to m).flatMap(r =>
        group.map { case (nm, _) => col(s"${nm}_${r}_id") }) :+
      col("reps") :+ col("total_us")
    runs.reduce(_ unionByName _).select(outCols: _*)
  }

  /** Group pattern under a Kleene plus — Flink's
    * `Pattern.begin(groupPattern).oneOrMore()`, e.g. `(A B)+`: one
    * match PER repetition count (Flink's oneOrMore emission — a run
    * that repeats 3 times also reports its 1- and 2-rep prefixes),
    * compiled as the UNION of the [[cepGroupTimes]] expansions
    * `n = 1..maxReps`. Output:
    * `(key, first_id, last_id, reps, total_us)` — FIRST/LAST/COUNT,
    * the MEASURES a variable-length group supports.
    *
    * `maxReps` BOUNDS the unrolling and is a hard output cap, not a
    * hint: candidate matches multiply with the per-step band fan-out
    * at every extra repetition (the same output-exponential cliff that
    * keeps `followedByAny` out of scope), so the cap fails loudly
    * rather than silently truncating longer runs.
    *
    * @note scale: Σ n·|group| interval joins over the unrolled chains;
    *   each chain is [[cepGroupTimes]]'s bounded shape and the union
    *   preserves the key partitioning. */
  def cepGroupKleene(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, group: Seq[(String, Column)], maxReps: Int,
      within: String): DataFrame = {
    require(group.size >= 2,
      "a 1-step group Kleene is plain B+ — use cepKleene/cepKleeneRelaxed")
    require(maxReps >= 1 && maxReps <= 8,
      s"oneOrMore over a group unrolls to maxReps·|group| joined slots " +
        s"with band-fan-out^slots candidate growth; maxReps=$maxReps is " +
        "outside the supported 1..8 — tighten the bound or the `within` band")
    require(group.map(_._1).distinct.size == group.size,
      "group step names must be distinct")
    // one guard on the longest chain (see alternationImpl)
    val longest = groupSteps(group, maxReps, within)
    if (longest.size >= DensityGuardSlots)
      densityGuard(ev, keyCol, tsCol, longest, 5e6)
    val runs = (1 to maxReps).map { n =>
      alternationImpl(ev, keyCol, tsCol, idCol, groupSteps(group, n, within))
        .select(col(keyCol),
          col(s"${group.head._1}_1_id").as("first_id"),
          col(s"${group.last._1}_${n}_id").as("last_id"),
          lit(n).cast("int").as("reps"), col("total_us"))
    }
    runs.reduce(_ unionByName _)
  }

  /** Absence pattern (Flink CEP `notFollowedBy` + `within`): events
    * matching `first` with NO `absent`-matching event for the same key
    * in `(ts, ts + within]` — "clicked but never purchased inside the
    * window", the churn/abandonment staple. Returns
    * `(key, a_id, a_ts_us)`.
    *
    * Planned as a LEFT-OUTER time-band join filtered to the null side
    * rather than an anti join: the two are equivalent in batch, and the
    * outer form is the one Structured Streaming supports for
    * stream-stream joins — with watermarks on both sides the null
    * verdict is emitted once the watermark proves no match can still
    * arrive (the same watermark-gated null semantics as
    * [[StreamOps.intervalJoinOuter]]).
    *
    * @note scale: one shuffle on the key; join state bounded by the
    *   band + watermark delay per side.
    * @note streaming caveat: Catalyst pushes the two predicates below
    *   their sides' watermark operators, so each side's watermark
    *   advances only from rows MATCHING that predicate, and the global
    *   watermark (hence null emission) is the min of the two — a quiet
    *   `absent` stream delays verdicts, exactly like an idle Flink
    *   source holding back the watermark. */
  def cepAbsence(ev: DataFrame, keyCol: String, tsCol: String, idCol: String,
      first: Column, absent: Column, within: String): DataFrame = {
    val a = ev.filter(first).select(col(keyCol).as("k"),
      col(tsCol).as("a_ts"), col(idCol).as("a_id"))
    val b = ev.filter(absent).select(col(keyCol).as("bk"),
      col(tsCol).as("b_ts"), col(idCol).as("b_id"))
    a.join(b, col("k") === col("bk") && col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"), "left_outer")
      .filter(col("b_id").isNull)
      .select(col("k").as(keyCol), col("a_id"),
        unix_micros(col("a_ts")).as("a_ts_us"))
  }

  /** Kleene pattern `A B+ C` with AFTER MATCH SKIP PAST LAST ROW
    * (Flink CEP `begin(A).next(B).oneOrMore().consecutive().greedy()
    * .next(C).within(Δt)` with `AfterMatchSkipStrategy.skipPastLastEvent`
    * — also SQL `MATCH_RECOGNIZE PATTERN (A B+ C)` over the relevant
    * events): per key, an `A` event immediately followed by a MAXIMAL
    * run of `B` events, terminated by the `C` event immediately after
    * the run, with the whole span inside `within`. Contiguity is over
    * the A/B/C-classified substream (events matching none of the
    * predicates are transparent, Flink's relaxed contiguity for
    * non-relevant events); an intervening A or C breaks/terminates a
    * run. Greedy + maximal runs make matches DISJOINT — each B run is
    * consumed by at most one match, which IS skip-past-last-row.
    *
    * When an event satisfies several predicates, classification
    * precedence is A > B > C (documented, both engines share it).
    * Returns `(key, a_id, n_b, first_b_id, last_b_id, c_id, span_us)`.
    *
    * Planned as gaps-and-islands: position-rank the classified
    * substream, group consecutive B positions into runs
    * (`pos − row_number()` over B rows), then anchor each run with the
    * A at `start−1` and the C at `end+1`. The streaming twin
    * ([[StreamOps.cepKleeneStream]]) is the O(1)-state automaton form
    * of the same scan; `CepKleeneSpec` pins replay equality.
    *
    * @note scale: both window passes and both anchor joins share ONE
    *   hash partitioning on the key — a single shuffle; run state
    *   inside the sort is one counter. No self-join of the full event
    *   stream, no per-key history scan. */
  def cepKleene(ev: DataFrame, keyCol: String, tsCol: String, idCol: String,
      predA: Column, predB: Column, predC: Column, within: String): DataFrame =
    kleeneMatches(ev, keyCol, tsCol, idCol, predA, predB, predC, within)
      .select(col("k").as(keyCol), col("a_id"), col("n_b"),
        col("first_b_id"), col("last_b_id"), col("c_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("a_ts"))).as("span_us"))

  /** [[cepKleene]] with MEASURES over the matched run (the SQL
    * `MATCH_RECOGNIZE ... MEASURES` surface): alongside the match
    * columns, aggregates of `valueCol` over the B+ events — exact
    * decimal SUM (rounded to 4, as double) and the derived AVG. COUNT,
    * FIRST and LAST are the existing `n_b`/`first_b_id`/`last_b_id`.
    * Returns `(key, a_id, n_b, first_b_id, last_b_id, c_id, sum_b,
    * avg_b, span_us)`.
    *
    * @note scale: the measures ride the run-grouping aggregate that
    *   already exists — zero extra shuffles. */
  def cepKleeneMeasures(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predA: Column, predB: Column, predC: Column,
      within: String, valueCol: Column): DataFrame =
    kleeneMatches(ev, keyCol, tsCol, idCol, predA, predB, predC, within,
      valueCol = Some(valueCol))
      .select(col("k").as(keyCol), col("a_id"), col("n_b"),
        col("first_b_id"), col("last_b_id"), col("c_id"),
        round(col("sum_b_dec"), 4).cast("double").as("sum_b"),
        round(col("sum_b_dec").cast("double") / col("n_b"), 4).as("avg_b"),
        (unix_micros(col("c_ts")) - unix_micros(col("a_ts"))).as("span_us"))

  /** Flink `begin(A).next(B).oneOrMore().consecutive().until(U)`: the
    * B+ loop runs until a `predU` event stops it — the until-event
    * TERMINATES the loop but is NOT part of the match, which is Flink's
    * `until` contract (contrast [[cepKleene]], where the closing step
    * IS matched). The match is the A anchor plus the maximal run, the
    * span ends at the LAST B, and `within` bounds A→last-B. Returns
    * `(key, a_id, n_b, first_b_id, last_b_id, span_us)`.
    *
    * Same gaps-and-islands machinery and skip-past-last-row disjointness
    * as [[cepKleene]] — only the emission differs. */
  def cepKleeneUntil(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predA: Column, predB: Column, predU: Column,
      within: String): DataFrame =
    kleeneMatches(ev, keyCol, tsCol, idCol, predA, predB, predU, within,
      boundToTerminator = false)
      .select(col("k").as(keyCol), col("a_id"), col("n_b"),
        col("first_b_id"), col("last_b_id"),
        (unix_micros(col("lastb_ts")) - unix_micros(col("a_ts"))).as("span_us"))

  /** Shared islands core of [[cepKleene]]/[[cepKleeneUntil]]: maximal
    * consecutive runs of the loop class anchored by A at `bstart-1` and
    * the terminator class at `bend+1`. `boundToTerminator` selects
    * whether `within` bounds A→terminator (kleene) or A→last-B (until,
    * where the terminator is outside the match). */
  private def kleeneMatches(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predA: Column, predB: Column, predC: Column,
      within: String, boundToTerminator: Boolean = true,
      valueCol: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev
      .withColumn("__cls",
        when(predA, lit("A")).when(predB, lit("B")).when(predC, lit("C")))
      .filter(col("__cls").isNotNull)
      .select(Seq(col(keyCol).as("k"), col(tsCol).as("ts"),
        col(idCol).as("id"), col("__cls").as("cls")) ++
        valueCol.map(_.as("v")).toSeq: _*)
    val wPos = Window.partitionBy(col("k")).orderBy(col("ts"), col("id"))
    val r = e.withColumn("pos", row_number().over(wPos))
    val wB = Window.partitionBy(col("k")).orderBy(col("pos"))
    // MEASURES over the matched run aggregate inside the SAME pass that
    // finds the run — exact decimal sum ([[graft.Det]] discipline)
    val measureAggs = valueCol.toSeq.flatMap { _ =>
      Seq(sum(col("v").cast(org.apache.spark.sql.types.DataTypes
        .createDecimalType(18, 6))).as("sum_b_dec"))
    }
    val bruns = r.filter(col("cls") === "B")
      .withColumn("grp", col("pos") - row_number().over(wB))
      .groupBy("k", "grp")
      .agg(min("pos").as("bstart"),
        (Seq(max("pos").as("bend"),
          count(lit(1)).as("n_b"),
          min_by(col("id"), col("pos")).as("first_b_id"),
          max_by(col("id"), col("pos")).as("last_b_id"),
          max_by(col("ts"), col("pos")).as("lastb_ts")) ++ measureAggs): _*)
    val aSide = r.filter(col("cls") === "A")
      .select(col("k").as("ak"), col("pos").as("apos"),
        col("id").as("a_id"), col("ts").as("a_ts"))
    val cSide = r.filter(col("cls") === "C")
      .select(col("k").as("ck"), col("pos").as("cpos"),
        col("id").as("c_id"), col("ts").as("c_ts"))
    val bound = if (boundToTerminator) col("c_ts") else col("lastb_ts")
    bruns
      .join(aSide, col("k") === col("ak") && col("apos") === col("bstart") - 1)
      .join(cSide, col("k") === col("ck") && col("cpos") === col("bend") + 1)
      .filter(bound <= col("a_ts") + expr(s"INTERVAL $within"))
  }

  /** Kleene pattern `A B+ C` with *relaxed* contiguity — Flink CEP's
    * DEFAULT `begin(A).followedBy(B).oneOrMore().followedBy(C)
    * .within(Δt)` with the NO_SKIP after-match strategy — bounded to
    * the first `maxPrefix` loop prefixes per anchor.
    *
    * Semantics (per key, events totally ordered by `(ts, id)`): the
    * loop's B events are the consecutive elements of the B-classified
    * substream starting at the FIRST B after the A anchor — relaxed
    * contiguity skips non-matching events (including C events, which
    * fork a completing branch without stopping the loop) but can never
    * skip a matching B (that would be `followedByAny`'s
    * non-deterministic relaxed contiguity, whose output is exponential
    * in run length — see the scaladoc on [[cepKleene]] for why that
    * form stays out of scope). Each prefix `b_1..b_L` (`L = 1..
    * maxPrefix`, smallest first — the deterministic cap the unbounded
    * quadratic form needs) completes with the FIRST C after `b_L`,
    * provided `c_ts ≤ a_ts + within`. Contrast [[cepKleene]]: greedy +
    * strict contiguity emits only the maximal run and consumes it;
    * here every bounded prefix emits and anchors are never consumed.
    * Every [[cepKleene]] match is also emitted here (with `L` = its
    * run length) when `maxPrefix` covers the run — `CepRelaxedSpec`
    * pins that subset relation and a brute-force reference.
    *
    * Returns `(key, a_id, n_b, first_b_id, last_b_id, c_id, span_us)`
    * — the [[cepKleene]] shape, `n_b` = the prefix length.
    *
    * @note scale: three window passes (position, running B count,
    *   next-C lookback) and the two prefix-endpoint joins ALL share one
    *   hash partitioning on the key — a single shuffle; the explode
    *   multiplies only A anchors by the constant `maxPrefix`, never
    *   the event stream. No self-join of the raw stream. */
  def cepKleeneRelaxed(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predA: Column, predB: Column, predC: Column,
      within: String, maxPrefix: Int): DataFrame =
    relaxedCore(ev, keyCol, tsCol, idCol, predA, predB, predC, within,
      maxPrefix, valueCol = None)
      .select(col("k").as(keyCol), col("a_id"), col("n_b"),
        col("first_b_id"), col("last_b_id"), col("c_id"), col("span_us"))

  /** [[cepKleeneRelaxed]] with MEASURES over each emitted prefix —
    * exact decimal SUM (micro-unit longs riding a cumulative-sum
    * column: `sum(prefix) = cum(last) − cum(first) + v(first)`, zero
    * extra shuffles) and the derived AVG, both rounded to 4 like
    * [[cepKleeneMeasures]]. Returns the relaxed match columns plus
    * `(sum_b, avg_b)`. */
  def cepKleeneRelaxedMeasures(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predA: Column, predB: Column, predC: Column,
      within: String, maxPrefix: Int, valueCol: Column): DataFrame =
    relaxedCore(ev, keyCol, tsCol, idCol, predA, predB, predC, within,
      maxPrefix, valueCol = Some(valueCol))
      .withColumn("sum_dec",
        (col("sum6").cast(org.apache.spark.sql.types.DataTypes
          .createDecimalType(18, 6)) / 1000000).cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)))
      .select(col("k").as(keyCol), col("a_id"), col("n_b"),
        col("first_b_id"), col("last_b_id"), col("c_id"),
        round(col("sum_dec"), 4).cast("double").as("sum_b"),
        round(col("sum_dec").cast("double") / col("n_b"), 4).as("avg_b"),
        col("span_us"))

  /** Shared prefix grid of [[cepKleeneRelaxed]] /
    * [[cepKleeneRelaxedMeasures]]; with a `valueCol` the B substream
    * additionally carries exact micro-unit cumulative sums and the
    * output gains `sum6` (the prefix's exact decimal(18,6) sum ×10⁶). */
  private def relaxedCore(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predA: Column, predB: Column, predC: Column,
      within: String, maxPrefix: Int, valueCol: Option[Column]): DataFrame = {
    require(maxPrefix >= 1, "maxPrefix must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val e = ev
      .withColumn("__cls",
        when(predA, lit("A")).when(predB, lit("B")).when(predC, lit("C")))
      .filter(col("__cls").isNotNull)
      .select(Seq(col(keyCol).as("k"), col(tsCol).as("ts"),
        col(idCol).as("id"), col("__cls").as("cls")) ++
        valueCol.map(v => (v.cast(org.apache.spark.sql.types.DataTypes
          .createDecimalType(18, 6)) * 1000000).cast("long").as("v6")).toSeq: _*)
    val wAsc = Window.partitionBy(col("k")).orderBy(col("ts"), col("id"))
    val wDesc = Window.partitionBy(col("k"))
      .orderBy(col("ts").desc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val r0 = e
      .withColumn("cumb",
        sum(when(col("cls") === "B", 1).otherwise(0)).over(wAsc))
      // earliest C strictly after this row: min struct over the rows
      // FOLLOWING in stream order (= preceding in the desc frame)
      .withColumn("nextc",
        min(when(col("cls") === "C", struct(col("ts"), col("id"))))
          .over(wDesc))
    val r = valueCol match {
      case Some(_) => r0.withColumn("cumv",
        sum(when(col("cls") === "B", col("v6")).otherwise(0L)).over(wAsc))
      case None => r0
    }
    val b = r.filter(col("cls") === "B")
      .select(Seq(col("k").as("bk"), col("cumb").as("bpos"),
        col("id").as("b_id"), col("nextc")) ++
        valueCol.map(_ => col("cumv").as("cumv_l")).toSeq: _*)
    val firstB = r.filter(col("cls") === "B")
      .select(Seq(col("k").as("fk"), col("cumb").as("fpos"),
        col("id").as("first_b_id")) ++
        valueCol.toSeq.flatMap(_ =>
          Seq(col("cumv").as("cumv_f"), col("v6").as("v6_f"))): _*)
    val a = r.filter(col("cls") === "A")
      .select(col("k"), col("ts").as("a_ts"), col("id").as("a_id"),
        (col("cumb") + 1).as("astart"))
      .withColumn("L", explode(sequence(lit(1), lit(maxPrefix))))
    val joined = a
      .join(firstB, col("k") === col("fk") && col("fpos") === col("astart"))
      .join(b, col("k") === col("bk") &&
        col("bpos") === col("astart") + col("L") - 1)
      .filter(col("nextc").isNotNull &&
        col("nextc.ts") <= col("a_ts") + expr(s"INTERVAL $within"))
    joined.select(Seq(col("k"), col("a_id"), col("L").cast("long").as("n_b"),
      col("first_b_id"), col("b_id").as("last_b_id"),
      col("nextc.id").as("c_id"),
      (unix_micros(col("nextc.ts")) - unix_micros(col("a_ts"))).as("span_us")) ++
      valueCol.map(_ =>
        (col("cumv_l") - col("cumv_f") + col("v6_f")).as("sum6")).toSeq: _*)
  }

  /** Quantified pattern `A{n}` with *strict* contiguity (Flink CEP
    * `times(n).consecutive()`): every run of `n` `predicate`-matching
    * events of one key with NO other event of that key — matching or
    * not — in between, whose span fits in `within`. Overlapping runs
    * each emit (Flink's default after-match-skip NO_SKIP). Returns
    * `(key, first_id, last_id, span_us)`.
    *
    * Strictness is enforced against the FULL keyed stream: events are
    * position-ranked before the predicate filter, and a run qualifies
    * only when its `n` matches occupy `n` adjacent positions — an
    * intervening non-match breaks the run, exactly Flink's
    * `consecutive()`. (An earlier revision lagged over the filtered
    * substream only, which admitted interrupted runs Flink rejects.)
    * The RELAXED variant (Flink's `times(n)` default) is exactly
    * [[cepPattern]] with `n` identical required steps, which is also
    * the streaming-capable form; `CepOpsSpec` pins the subset relation
    * between the two.
    *
    * @note scale: two window passes (rank, then lag) share one
    *   partitioning on the key — a single shuffle, no self-join; lag
    *   state is n-1 rows per key inside the sort. */
  def cepTimes(ev: DataFrame, keyCol: String, tsCol: String, idCol: String,
      predicate: Column, n: Int, within: String): DataFrame = {
    require(n >= 2, "times(n) needs n >= 2")
    timesRuns(ev, keyCol, tsCol, idCol, predicate, n, within)
      .select(col(keyCol), col("first_id"), col("last_id"),
        (unix_micros(col("last_ts")) - unix_micros(col("first_ts")))
          .as("span_us"))
  }

  /** Shared run extractor behind the `times` family: every
    * strict-contiguity `n`-run of `predicate` events as
    * `(key, first_id, last_id, first_ts, last_ts)` — the rank-then-lag
    * form [[cepTimes]] documents, with the run-edge TIMESTAMPS kept so
    * callers that must join something onto the run's tail (the
    * reluctant form's post step) don't re-derive them. */
  private def timesRuns(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predicate: Column, n: Int,
      within: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    ev.withColumn("__pos", row_number().over(w))
      .filter(predicate)
      .select(col(keyCol), col(tsCol), col(idCol), col("__pos"))
      .withColumn("first_ts", lag(col(tsCol), n - 1).over(w))
      .withColumn("first_id", lag(col(idCol), n - 1).over(w))
      .withColumn("first_pos", lag(col("__pos"), n - 1).over(w))
      .filter(col("first_pos").isNotNull &&
        col("__pos") - col("first_pos") === lit(n - 1) &&
        col(tsCol) <= col("first_ts") + expr(s"INTERVAL $within"))
      .select(col(keyCol), col("first_id"), col(idCol).as("last_id"),
        col("first_ts"), col(tsCol).as("last_ts"))
  }

  /** Quantified pattern `A{n,m}` with strict contiguity — Flink
    * `times(from, to).consecutive()`: one match per (start, length)
    * window of `k` adjacent predicate-matching events for every
    * `k ∈ n..m` whose span fits `within` (NO_SKIP, as [[cepTimes]] —
    * a long run emits every qualifying window of every length in the
    * range). The UNION of the fixed-count forms, each tagged with its
    * `reps`. Returns `(key, first_id, last_id, reps, span_us)`.
    *
    * @note scale: m−n+1 [[cepTimes]] passes, each two window
    *   functions over one keyed shuffle; the union preserves the
    *   partitioning. */
  def cepTimesRange(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predicate: Column, n: Int, m: Int,
      within: String): DataFrame = {
    require(n >= 2 && m > n,
      s"times($n,$m): need 2 <= n < m — times(n) is the fixed-count form")
    (n to m).map { k =>
      cepTimes(ev, keyCol, tsCol, idCol, predicate, k, within)
        .withColumn("reps", lit(k).cast("int"))
        .select(col(keyCol), col("first_id"), col("last_id"), col("reps"),
          col("span_us"))
    }.reduce(_ unionByName _)
  }

  /** RELUCTANT quantified variable `A{n,m}? B` — SQL MATCH_RECOGNIZE's
    * non-greedy quantifier: per match START, the SHORTEST run length
    * `k ∈ n..m` of strictly-consecutive `predicate` events whose tail
    * a `postPred` event closes within `within` wins; longer counts for
    * the same anchor are discarded. Contrast [[cepTimesRange]] (the
    * greedy/all-counts emission — one match PER count). The post step
    * follows with RELAXED contiguity (Flink `followedBy`: non-matching
    * events — including further `predicate` events — may sit between
    * the run's tail and the closer), which is what makes the argmin
    * non-trivial: a 2-run whose band holds no closer loses to the
    * 3-run extension whose later tail reaches one.
    *
    * TIE-BREAK CONTRACT (the part the standard leaves to the SKIP
    * clause): within the minimal count, EVERY qualifying closer event
    * emits (the library's NO_SKIP contract, as everywhere); SQL's
    * ONE ROW PER MATCH + SKIP PAST LAST additionally dedups
    * overlapping anchors — a strictly stronger pruning, documented as
    * out of contract here. Flink's Pattern API has no reluctant
    * toggle for `times` at all (only SQL `{n,m}?`), so the SQL form
    * is the semantics certified by the oracle. Returns
    * `(key, first_id, last_id, <postName>_id, reps, span_us)` with
    * `span_us` spanning first run event to the closer.
    *
    * @note scale: m−n+1 rank-then-lag window passes sharing one keyed
    *   shuffle + one time-band join against the post events + one
    *   (key, first_id) window for the argmin — all fan-out bounded by
    *   events-per-key inside the band; no per-key history scan. */
  def cepTimesRangeReluctant(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predicate: Column, n: Int, m: Int, within: String,
      postName: String, postPred: Column): DataFrame =
    timesRangeClosed(ev, keyCol, tsCol, idCol, predicate, n, m, within,
      Seq(postName -> postPred), greedy = false)

  /** [[cepTimesRangeReluctant]] with a post CHAIN `A{n,m}? B C …`: the
    * run's tail must be followed (relaxed contiguity, each step within
    * `within` of the previous) by EVERY `post` step in order for a
    * count to qualify — the same generalization the group kernel
    * ([[cepGroupRangeReluctant]]) carries, unified onto the
    * single-variable face so one closer is no longer a restriction.
    * Output: `(key, first_id, last_id, <post>_id …, reps, span_us)`
    * with `span_us` spanning first run event to the LAST post event. */
  def cepTimesRangeReluctant(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predicate: Column, n: Int, m: Int, within: String,
      post: Seq[(String, Column)]): DataFrame =
    timesRangeClosed(ev, keyCol, tsCol, idCol, predicate, n, m, within,
      post, greedy = false)

  /** GREEDY quantified variable `A{n,m} B` — SQL MATCH_RECOGNIZE's
    * DEFAULT quantifier semantics and Flink's `.greedy()`: per match
    * start, the LONGEST run length in `n..m` whose tail a `postPred`
    * event closes wins — the argmax mirror of
    * [[cepTimesRangeReluctant]] over the identical per-count union,
    * same tie-break contract (extremal count per anchor, NO_SKIP
    * all-combinations within it). Contrast [[cepTimesRange]], which
    * keeps Flink's `times(from, to)` ALL-counts emission. */
  def cepTimesRangeGreedy(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predicate: Column, n: Int, m: Int, within: String,
      postName: String, postPred: Column): DataFrame =
    timesRangeClosed(ev, keyCol, tsCol, idCol, predicate, n, m, within,
      Seq(postName -> postPred), greedy = true)

  /** [[cepTimesRangeGreedy]] with a post CHAIN `A{n,m} B C …` — the
    * argmax mirror of the chained reluctant face; see
    * [[cepTimesRangeReluctant]]'s chain overload for the contract. */
  def cepTimesRangeGreedy(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predicate: Column, n: Int, m: Int, within: String,
      post: Seq[(String, Column)]): DataFrame =
    timesRangeClosed(ev, keyCol, tsCol, idCol, predicate, n, m, within,
      post, greedy = true)

  private def timesRangeClosed(ev: DataFrame, keyCol: String,
      tsCol: String, idCol: String, predicate: Column, n: Int, m: Int,
      within: String, post: Seq[(String, Column)],
      greedy: Boolean): DataFrame = {
    require(n >= 2 && m > n,
      s"times($n,$m): need 2 <= n < m — times(n) is the fixed-count form")
    require(post.nonEmpty,
      "the greedy/reluctant axis needs at least one post step to decide " +
        "against — the open range is cepTimesRange (all-counts emission)")
    val postNames = post.map(_._1 + "_id")
    require(postNames.distinct.size == postNames.size,
      s"post step names must be distinct: ${post.map(_._1)}")
    // the kernel's own output columns: a post step named 'first'/'last'
    // would collide as <name>_id, and 'reps'/'span_us'/the key column
    // collide directly — reject loudly here instead of surfacing as an
    // ambiguous-column analysis error deep in the chained join
    val reserved = Set("first_id", "last_id", "reps", "span_us", keyCol)
    val clash = post.map(_._1).filter(nm =>
      reserved.contains(nm + "_id") || reserved.contains(nm))
    require(clash.isEmpty,
      s"post step names $clash collide with the kernel's output columns " +
        s"(first_id/last_id/reps/span_us/$keyCol)")
    val runs = (n to m).map { k =>
      timesRuns(ev, keyCol, tsCol, idCol, predicate, k, within)
        .withColumn("reps", lit(k).cast("int"))
    }.reduce(_ unionByName _)
    // chain the post steps with relaxed contiguity, each within the
    // band of the previous bound event (the cepAlternation leg shape)
    val chained = post.zipWithIndex.foldLeft(
        runs.withColumn("__last", col("last_ts"))) {
      case (acc, ((nm, p), i)) =>
        val e = ev.filter(p).select(col(keyCol).as(s"__pk_$i"),
          col(tsCol).as(s"__p_ts_$i"), col(idCol).as(s"${nm}_id"))
        acc.join(e, col(keyCol) === col(s"__pk_$i") &&
            col(s"__p_ts_$i") > col("__last") &&
            col(s"__p_ts_$i") <= col("__last") + expr(s"INTERVAL $within"))
          .withColumn("__last", col(s"__p_ts_$i"))
          .drop(s"__pk_$i", s"__p_ts_$i")
    }
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("first_id"))
    val pick = if (greedy) max(col("reps")) else min(col("reps"))
    chained
      .select(Seq(col(keyCol), col("first_id"), col("last_id")) ++
        postNames.map(col) ++ Seq(col("reps"),
        (unix_micros(col("__last")) - unix_micros(col("first_ts")))
          .as("span_us")): _*)
      .withColumn("__xr", pick.over(wa))
      .filter(col("reps") === col("__xr"))
      .drop("__xr")
  }

  /** RELUCTANT group quantifier `[A …] (B C){n,m}? D…` — the
    * sequence-group face of the non-greedy axis: per match START
    * (the ANCHOR — see below), the SHORTEST repetition count
    * `r ∈ n..m` whose chain the `post` steps complete wins; longer
    * counts for the same anchor are discarded. Compiled as the
    * per-anchor argmin over the [[cepGroupRange]]-style union with the
    * `pre` steps prepended and the `post` steps appended to every
    * per-count chain — which is exactly why `post` is REQUIRED: a
    * standalone reluctant range degenerates (every match's n-rep
    * prefix is itself a match with the same anchor, so the argmin
    * always selects `n` — that form IS [[cepGroupTimes]]`(n)`, with or
    * without pre steps) and is rejected loudly rather than keyed twice.
    *
    * ANCHOR-IDENTITY CONTRACT: the anchor is the MATCH START's bound
    * event — `pre.head`'s event when outer pre steps exist (SQL's
    * match start for `A (B C){n,m}? D` is A's row), else the group's
    * first bound event. The quantifier is lazy PER MATCH START, so one
    * A-event choosing among several group entries still selects one
    * minimal count across all of them — exactly MATCH_RECOGNIZE's
    * per-match laziness, not per-group-entry.
    *
    * Same TIE-BREAK CONTRACT as [[cepTimesRangeReluctant]]: minimal
    * count per anchor, NO_SKIP all-combinations within it.
    * `matchWithinUs` (the PATTERN's whole-match WITHIN bound) prunes
    * candidates BEFORE the argmin — an anchor whose minimal-count
    * chain busts the bound falls through to its shortest IN-BOUND
    * completion instead of being dropped (filter-after-argmin would
    * diverge from reluctant semantics precisely on those anchors).
    * Output: `(key, <pre>_id …, <step>_<rep>_id for rep = 1..m
    * (null-padded), <post>_id …, reps, total_us)`.
    *
    * @note scale: Σ (|pre| + r·|group| + |post|) keyed interval joins
    *   over the unrolled chains (r = n..m) + one (key, anchor)
    *   window — each chain is the bounded fixed-length shape, the
    *   union preserves the key partitioning; no per-key history scan.
    *   The density guard runs ONCE, on the longest chain. */
  def cepGroupRangeReluctant(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, group: Seq[(String, Column)], n: Int, m: Int,
      within: String, post: Seq[(String, Column)],
      pre: Seq[(String, Column)] = Nil,
      matchWithinUs: Option[Long] = None): DataFrame =
    groupRangeClosed(ev, keyCol, tsCol, idCol, pre, group, n, m, within,
      post, greedy = false, matchWithinUs)

  /** GREEDY group quantifier `[A …] (B C){n,m} D…` — SQL
    * MATCH_RECOGNIZE's DEFAULT quantifier semantics and Flink's
    * `times(from, to).greedy()` on a sequence group: per match start,
    * the LONGEST repetition count whose chain the `post` steps
    * complete wins — the argmax mirror of [[cepGroupRangeReluctant]]
    * over the identical per-count union; same anchor-identity and
    * tie-break contracts (extremal count per anchor, NO_SKIP
    * all-combinations within it). `post` is required here too: the
    * standalone greedy form is [[cepGroupRange]]'s all-counts union
    * under a per-anchor max — compose those two rather than keying the
    * union twice. */
  def cepGroupRangeGreedy(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, group: Seq[(String, Column)], n: Int, m: Int,
      within: String, post: Seq[(String, Column)],
      pre: Seq[(String, Column)] = Nil,
      matchWithinUs: Option[Long] = None): DataFrame =
    groupRangeClosed(ev, keyCol, tsCol, idCol, pre, group, n, m, within,
      post, greedy = true, matchWithinUs)

  /** Shared kernel of the closed (post-decided) group-range axis —
    * [[cepGroupRangeReluctant]] (argmin) / [[cepGroupRangeGreedy]]
    * (argmax) document the contracts. */
  private def groupRangeClosed(ev: DataFrame, keyCol: String,
      tsCol: String, idCol: String, pre: Seq[(String, Column)],
      group: Seq[(String, Column)], n: Int, m: Int, within: String,
      post: Seq[(String, Column)], greedy: Boolean,
      matchWithinUs: Option[Long]): DataFrame = {
    require(post.nonEmpty,
      if (greedy)
        "a standalone greedy range is cepGroupRange's all-counts union " +
          "under a per-anchor max — compose those two; the greedy axis " +
          "needs at least one post step to decide against"
      else
        "a standalone reluctant range always selects n repetitions (every " +
          "match's n-rep prefix shares its anchor) — that form is exactly " +
          "cepGroupTimes(n); reluctance needs at least one post step to " +
          "decide against")
    require(group.nonEmpty, "a group needs at least one step")
    require(n >= 1 && m > n,
      s"times($n,$m): need 1 <= n < m — times(n) is the fixed-count form")
    require(m <= 8,
      s"times($n,$m) unrolls to m·|group| joined slots with " +
        s"band-fan-out^slots candidate growth; m=$m is outside the " +
        "supported 2..8 — tighten the bound or the `within` band")
    require(group.map(_._1).distinct.size == group.size,
      "group step names must be distinct")
    val padNames = (1 to m).flatMap(r =>
      group.map { case (nm, _) => s"${nm}_${r}_id" })
    val names = pre.map(_._1 + "_id") ++ padNames ++ post.map(_._1 + "_id")
    require(names.distinct.size == names.size,
      s"outer step names must not collide with the unrolled group " +
        s"columns: $names")
    def chainSteps(r: Int): Seq[AltStep] = {
      val unrolled = (1 to r).flatMap(rr =>
        group.map { case (nm, p) => s"${nm}_$rr" -> p })
      (pre ++ unrolled ++ post).map { case (nm, p) =>
        AltStep(nm, Seq(nm -> p), within) }
    }
    // one guard on the longest chain (see alternationImpl)
    val longest = chainSteps(m)
    if (longest.size >= DensityGuardSlots)
      densityGuard(ev, keyCol, tsCol, longest, 5e6)
    val runs = (n to m).map { r =>
      val run = alternationImpl(ev, keyCol, tsCol, idCol, chainSteps(r))
      val idType = run.schema(s"${group.head._1}_1_id").dataType
      val padded = (r + 1 to m)
        .flatMap(rr => group.map { case (nm, _) => s"${nm}_${rr}_id" })
        .foldLeft(run)((d, c) => d.withColumn(c, lit(null).cast(idType)))
      padded.withColumn("reps", lit(r).cast("int"))
    }
    val anchor =
      if (pre.nonEmpty) s"${pre.head._1}_id" else s"${group.head._1}_1_id"
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col(anchor))
    val pick = if (greedy) max(col("reps")) else min(col("reps"))
    val outCols = (col(keyCol) +: pre.map(p => col(s"${p._1}_id"))) ++
      padNames.map(col) ++
      post.map { case (nm, _) => col(s"${nm}_id") } ++
      Seq(col("reps"), col("total_us"))
    val union = runs.reduce(_ unionByName _)
    val bounded = matchWithinUs
      .fold(union)(b => union.filter(col("total_us") <= b))
    bounded
      .withColumn("__xr", pick.over(wa))
      .filter(col("reps") === col("__xr"))
      .select(outCols: _*)
  }

  /** 2-step pattern `A → B within Δt` under Flink's AFTER MATCH SKIP TO
    * NEXT ROW: every A-start yields at most ONE match — its earliest
    * completing B (ties on B time broken by id) — and starts are never
    * consumed by other matches, so matches may overlap in their B.
    * Contrast [[cepPattern]] (NO_SKIP: every A×B combination) and
    * [[cepSkipPastLast]] (greedy disjoint matches). Returns
    * `(key, a_id, b_id, gap_us)`.
    *
    * Declarative: one time-band equi-join, then an argmin per start —
    * runs batch or streaming (watermark-bounded join state) unchanged.
    *
    * @note scale: one shuffle on the key for the join, one on
    *   (key, a_id) for the argmin; band fan-out bounded by
    *   events-per-key within Δt, and only (ts, id) pairs — not payloads
    *   — reach the argmin. */
  def cepSkipToNext(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predA: Column, predB: Column,
      within: String): DataFrame = {
    val a = ev.filter(predA).select(col(keyCol).as("k"),
      col(tsCol).as("a_ts"), col(idCol).as("a_id"))
    val b = ev.filter(predB).select(col(keyCol).as("bk"),
      col(tsCol).as("b_ts"), col(idCol).as("b_id"))
    a.join(b, col("k") === col("bk") && col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"))
      .groupBy(col("k").as(keyCol), col("a_ts"), col("a_id"))
      .agg(min(struct(col("b_ts"), col("b_id"))).as("m"))
      .select(col(keyCol), col("a_id"), col("m.b_id").as("b_id"),
        (unix_micros(col("m.b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
  }

  /** 2-step pattern `A → B within Δt` under Flink's AFTER MATCH SKIP
    * PAST LAST EVENT — the funnel default: matches are GREEDY and
    * DISJOINT. Scanning each key in `(ts, id)` order, a B event closes
    * a match with the EARLIEST still-valid open A (`b_ts − a_ts ≤ Δt`,
    * `a_ts > ` previous match's B time), and a completed match discards
    * every open partial. Returns `(key, a_id, b_id)`.
    *
    * Greedy matching is inherently sequential per key (its DuckDB
    * oracle needs a recursive CTE), so this is a keyed scan, not a
    * join: one shuffle on the key, then a linear pass holding only the
    * open-A queue — the same O(events-in-Δt) state bound Flink's NFA
    * keeps for this pattern.
    *
    * @note scale: per-key memory here is the key's (ts, id, class)
    *   triples for the in-scan sort (the standard sessionization
    *   bound); the streaming twin [[StreamOps.cepSkipPastLastStream]]
    *   holds only the O(Δt) automaton state. */
  def cepSkipPastLast(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String, predA: Column, predB: Column,
      withinUs: Long): DataFrame = {
    val sp = ev.sparkSession
    import sp.implicits._
    ev.withColumn("__isa", when(predA, lit(true)).when(predB, lit(false)))
      .filter(col("__isa").isNotNull)
      .select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("ts_us"),
        col(idCol).as("id"), col("__isa").as("isA"))
      .as[(Long, Long, Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        val open = scala.collection.mutable.ArrayDeque.empty[(Long, Long)]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var pos = Long.MinValue
        evs.foreach { case (_, tsUs, id, isA) =>
          if (isA) { if (tsUs > pos) open.append((tsUs, id)) }
          else {
            while (open.nonEmpty && open.head._1 < tsUs - withinUs)
              open.removeHead()
            if (open.nonEmpty && open.head._1 < tsUs) {
              out += ((k, open.head._2, id)); pos = tsUs; open.clear()
            }
          }
        }
        out.iterator
      }
      .toDF(keyCol, "a_id", "b_id")
  }
}
