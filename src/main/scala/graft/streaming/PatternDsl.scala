package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

/** MATCH_RECOGNIZE-flavored pattern builder — the SQL-ish face Flink
  * users get via `MATCH_RECOGNIZE` / the CEP `Pattern` API, compiled
  * onto this library's existing operators rather than a new engine:
  *
  *  - `begin(A).next(B).next(C)…` (each step `within` its
  *    predecessor, steps optionally `.optional()`) →
  *    [[CepOps.cepPattern]] (chained interval joins, streaming-capable)
  *  - `begin(A).next(B).oneOrMore().next(C).within(Δ)` →
  *    [[CepOps.cepKleene]] (greedy consecutive B+, skip past last row;
  *    streaming twin [[StreamOps.cepKleeneStream]])
  *  - `begin(A).notFollowedBy(B).within(Δ)` → [[CepOps.cepAbsence]]
  *  - `begin(A).times(n).consecutive().within(Δ)` → [[CepOps.cepTimes]]
  *  - `begin(A).times(n, m).consecutive().within(Δ)` →
  *    [[CepOps.cepTimesRange]] (one match per length, tagged `reps`)
  *  - `Pattern.group(Δ, steps…).times(n)` / `.times(n, m)` /
  *    `.oneOrMore(max)` → the quantified-sequence-group family
  *    ([[CepOps.cepGroupTimes]] / [[CepOps.cepGroupRange]] /
  *    [[CepOps.cepGroupKleene]]); `.precededBy/.followedBy` mix outer
  *    steps with the times(n) form ([[CepOps.cepGroupTimesMixed]])
  *
  * The builder is immutable; `over(ev, key, ts, id)` validates the
  * shape and dispatches. Output schema is the target operator's —
  * pinned equal to the direct calls by `PatternDslSpec`.
  *
  * {{{
  * Pattern.begin("click", col("event_type") === "click")
  *   .next("error", col("event_type") === "error", within = "360 minutes", optional = true)
  *   .next("purchase", col("event_type") === "purchase", within = "360 minutes")
  *   .over(events, "user_id", "ts", "event_id")
  * }}}
  *
  * @note scale: zero cost of its own — each shape compiles to the
  *   documented plan of its target operator (one keyed shuffle per
  *   join/window stage; see the operators' scale notes).
  */
object Pattern {
  def begin(name: String, pred: Column): PatternBuilder =
    new PatternBuilder(Vector(DslStep(name, pred, "0 minutes",
      optional = false, oneOrMore = false)), None, None, consecutive = false, None)

  /** Begin with a named-alternation slot `(B|C)` — see
    * [[PatternBuilder.nextAny]]. */
  def beginAny(name: String, branches: (String, Column)*): PatternBuilder = {
    require(branches.nonEmpty, "beginAny needs at least one branch")
    new PatternBuilder(Vector(DslStep(name, branches.head._2, "0 minutes",
      optional = false, oneOrMore = false, alts = branches.toVector)),
      None, None, consecutive = false, None)
  }

  /** A quantified sequence group whose members may be NAMED
    * ALTERNATIONS — `((B|C) D){n}` with per-repetition branch
    * identity ([[CepOps.cepGroupAlt]]):
    * {{{
    * Pattern.groupAny("60 minutes",
    *     "m" -> Seq("b" -> predB, "c" -> predC),
    *     "d" -> Seq("d" -> predD))
    *   .times(2)
    *   .over(events, "user_id", "ts", "event_id")
    * }}}
    * Fixed counts only — a Kleene over alternation members would
    * multiply the per-repetition unions by the branch combinations
    * and is rejected at the builder. */
  def groupAny(within: String,
      steps: (String, Seq[(String, Column)])*): AltGroupPattern = {
    require(steps.size >= 1, "a group needs at least one member")
    new AltGroupPattern(steps.toVector, within)
  }

  /** A quantified SEQUENCE group — Flink's
    * `Pattern.begin(groupPattern)` under `times`/`oneOrMore`:
    * {{{
    * Pattern.group("60 minutes",
    *     "a" -> predA, "b" -> predB)
    *   .times(2)        // (A B){2}  → CepOps.cepGroupTimes
    *   .over(events, "user_id", "ts", "event_id")
    * }}}
    * `oneOrMore(maxReps)` compiles `(A B)+` via
    * [[CepOps.cepGroupKleene]] (one match per repetition count,
    * `maxReps` a hard loud-fail bound). Each step matches within
    * `within` of the previous event, relaxed contiguity. */
  def group(within: String, steps: (String, Column)*): GroupPattern = {
    require(steps.size >= 2, "a group needs two or more steps")
    new GroupPattern(steps.toVector, within)
  }
}

/** An alternation-member group awaiting its quantifier — see
  * [[Pattern.groupAny]]. */
final class AltGroupPattern private[streaming] (
    steps: Vector[(String, Seq[(String, Column)])], within: String) {
  /** `(group){n}` — fixed repetition count; multi-branch members bind
    * `<member>_<rep>_branch` alongside `<member>_<rep>_id`. */
  def times(n: Int): QuantifiedAltGroup =
    new QuantifiedAltGroup(steps, within, n)
}

/** A quantified alternation-member group ready to compile. */
final class QuantifiedAltGroup private[streaming] (
    steps: Vector[(String, Seq[(String, Column)])], within: String,
    n: Int) {
  def over(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame =
    CepOps.cepGroupAlt(ev, keyCol, tsCol, idCol, steps, n, within)
}

/** A sequence group awaiting its quantifier — see [[Pattern.group]]. */
final class GroupPattern private[streaming] (
    steps: Vector[(String, Column)], within: String) {
  /** `(group){n}` — fixed repetition count, every event bound as a
    * `<step>_<rep>_id` column. */
  def times(n: Int): QuantifiedGroup =
    new QuantifiedGroup(steps, within, Some(n), 0)
  /** `(group){n,m}` — one match per repetition count in `n..m`
    * (Flink's `times(from, to)`), per-repetition columns null-padded
    * to the m-shape plus a `reps` count
    * ([[CepOps.cepGroupRange]]). Outer steps do not mix — each rep
    * count would multiply the outer chain. */
  def times(n: Int, m: Int): QuantifiedGroupRange =
    new QuantifiedGroupRange(steps, within, n, m)
  /** `(group)+` — one match per repetition count up to `maxReps` (a
    * hard bound, loud on overflow); output
    * `(key, first_id, last_id, reps, total_us)`. */
  def oneOrMore(maxReps: Int = 3): QuantifiedGroup =
    new QuantifiedGroup(steps, within, None, maxReps)
}

/** A range-quantified sequence group ready to compile — see
  * [[GroupPattern.times(n:Int,m:Int)*]]. */
final class QuantifiedGroupRange private[streaming] (
    steps: Vector[(String, Column)], within: String, n: Int, m: Int) {
  def over(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame =
    CepOps.cepGroupRange(ev, keyCol, tsCol, idCol, steps, n, m, within)

  /** SQL `{n,m}?` — the NON-GREEDY range: per anchor, the shortest
    * count whose chain the post steps complete wins. Needs at least
    * one [[ClosedGroupRange.followedBy]] post step (a standalone
    * reluctant range is exactly `times(n)` — the kernel rejects it
    * loudly). */
  def reluctant: ClosedGroupRange =
    new ClosedGroupRange(steps, within, n, m, Vector.empty, Vector.empty,
      greedy = false)

  /** SQL's DEFAULT (greedy) range / Flink `times(from, to).greedy()`:
    * per anchor, the LONGEST count whose chain the post steps complete
    * wins — the argmax mirror of [[reluctant]]. Needs at least one
    * [[ClosedGroupRange.followedBy]] post step (the standalone greedy
    * form is [[over]]'s all-counts union under a per-anchor max). */
  def greedy: ClosedGroupRange =
    new ClosedGroupRange(steps, within, n, m, Vector.empty, Vector.empty,
      greedy = true)
}

/** A closed (post-step-decided) single-variable range ready to
  * compile — see [[PatternBuilder.reluctantlyFollowedBy]] (argmin) /
  * [[PatternBuilder.greedilyFollowedBy]] (argmax). [[followedBy]]
  * extends the closer to a post CHAIN (`A{n,m}? B C …`). */
final class ClosedTimesRange private[streaming] (
    pred: Column, n: Int, m: Int, within: String,
    post: Vector[(String, Column)], greedy: Boolean) {
  /** Append a further post step AFTER the closer (repeatable, call
    * order) — a count qualifies only when the WHOLE chain completes. */
  def followedBy(name: String, postPred: Column): ClosedTimesRange =
    new ClosedTimesRange(pred, n, m, within, post :+ (name -> postPred),
      greedy)
  def over(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame =
    if (greedy)
      CepOps.cepTimesRangeGreedy(ev, keyCol, tsCol, idCol, pred, n, m,
        within, post)
    else
      CepOps.cepTimesRangeReluctant(ev, keyCol, tsCol, idCol, pred, n, m,
        within, post)
}

/** A closed (post-step-decided) range-quantified group collecting its
  * outer steps — see [[QuantifiedGroupRange.reluctant]] (argmin) /
  * [[QuantifiedGroupRange.greedy]] (argmax); compiles
  * [[CepOps.cepGroupRangeReluctant]] / [[CepOps.cepGroupRangeGreedy]],
  * which document the anchor-identity and tie-break contracts. */
final class ClosedGroupRange private[streaming] (
    steps: Vector[(String, Column)], within: String, n: Int, m: Int,
    pre: Vector[(String, Column)], post: Vector[(String, Column)],
    greedy: Boolean) {
  /** Prepend an outer step BEFORE the group (repeatable; steps keep
    * call order) — the MATCH START moves to the first pre step, and
    * with it the anchor the per-match count is decided for. */
  def precededBy(name: String, pred: Column): ClosedGroupRange =
    new ClosedGroupRange(steps, within, n, m, pre :+ (name -> pred),
      post, greedy)
  /** Append an outer step AFTER the group (repeatable, call order) —
    * the step(s) whose completion decides the per-anchor count. */
  def followedBy(name: String, pred: Column): ClosedGroupRange =
    new ClosedGroupRange(steps, within, n, m, pre, post :+ (name -> pred),
      greedy)
  def over(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame =
    if (greedy)
      CepOps.cepGroupRangeGreedy(ev, keyCol, tsCol, idCol, steps, n, m,
        within, post, pre)
    else
      CepOps.cepGroupRangeReluctant(ev, keyCol, tsCol, idCol, steps, n, m,
        within, post, pre)
}

/** A quantified group ready to compile — see [[Pattern.group]]. Fixed
  * (`times`) groups additionally MIX with outer plain steps
  * (`precededBy`/`followedBy` — Flink's
  * `begin(A).next(group.times(n)).next(D)`), compiling the
  * `A (B C){n} D` shape via [[CepOps.cepGroupTimesMixed]]; the Kleene
  * form rejects outer steps loudly (its per-repetition unions would
  * multiply by the outer chain). */
final class QuantifiedGroup private[streaming] (
    steps: Vector[(String, Column)], within: String,
    fixed: Option[Int], maxReps: Int,
    pre: Vector[(String, Column)] = Vector.empty,
    post: Vector[(String, Column)] = Vector.empty) {

  /** Prepend an outer step BEFORE the group (repeatable; steps keep
    * call order: `precededBy(a).precededBy(b)` matches `a b (group)`). */
  def precededBy(name: String, pred: Column): QuantifiedGroup = {
    require(fixed.isDefined,
      "outer steps mix with times(n) groups only — (group)+ with outer " +
        "steps is not a compiled combination")
    new QuantifiedGroup(steps, within, fixed, maxReps,
      pre :+ (name -> pred), post)
  }

  /** Append an outer step AFTER the group (repeatable, call order). */
  def followedBy(name: String, pred: Column): QuantifiedGroup = {
    require(fixed.isDefined,
      "outer steps mix with times(n) groups only — (group)+ with outer " +
        "steps is not a compiled combination")
    new QuantifiedGroup(steps, within, fixed, maxReps, pre,
      post :+ (name -> pred))
  }

  def over(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = fixed match {
    case Some(n) if pre.nonEmpty || post.nonEmpty =>
      CepOps.cepGroupTimesMixed(ev, keyCol, tsCol, idCol,
        pre, steps, n, post, within)
    case Some(n) =>
      CepOps.cepGroupTimes(ev, keyCol, tsCol, idCol, steps, n, within)
    case None =>
      CepOps.cepGroupKleene(ev, keyCol, tsCol, idCol, steps, maxReps, within)
  }
}

private[streaming] final case class DslStep(name: String, pred: Column,
    within: String, optional: Boolean, oneOrMore: Boolean, minTimes: Int = 1,
    alts: Seq[(String, Column)] = Nil)

final class PatternBuilder private[streaming] (
    steps: Vector[DslStep],
    absent: Option[(String, Column)],
    nTimes: Option[Int],
    consecutive: Boolean,
    globalWithin: Option[String],
    untilPred: Option[Column] = None,
    relaxedMax: Option[Int] = None,
    nTimesHi: Option[Int] = None) {

  private def copy(steps: Vector[DslStep] = steps,
      absent: Option[(String, Column)] = absent,
      nTimes: Option[Int] = nTimes,
      consecutive: Boolean = consecutive,
      globalWithin: Option[String] = globalWithin,
      untilPred: Option[Column] = untilPred,
      relaxedMax: Option[Int] = relaxedMax,
      nTimesHi: Option[Int] = nTimesHi) =
    new PatternBuilder(steps, absent, nTimes, consecutive, globalWithin,
      untilPred, relaxedMax, nTimesHi)

  /** Append a required (or `optional = true`) step bound `within` the
    * previous matched step. */
  def next(name: String, pred: Column, within: String = "0 minutes",
      optional: Boolean = false): PatternBuilder = {
    require(absent.isEmpty, "notFollowedBy must be the final element")
    copy(steps = steps :+ DslStep(name, pred, within, optional, oneOrMore = false))
  }

  /** Append a NAMED-ALTERNATION slot (Flink's group pattern
    * `(B | C)`): the slot matches when any branch matches, and the
    * output carries `<name>_branch` naming the branch that fired —
    * branch identity a single OR-predicate step loses. Compiles via
    * [[CepOps.cepAlternation]] (one interval-join leg per branch,
    * unioned); mixing with oneOrMore/times/notFollowedBy is not a
    * compiled combination. */
  def nextAny(name: String, within: String,
      branches: (String, Column)*): PatternBuilder = {
    require(absent.isEmpty, "notFollowedBy must be the final element")
    require(branches.nonEmpty, "nextAny needs at least one branch")
    copy(steps = steps :+ DslStep(name, branches.head._2, within,
      optional = false, oneOrMore = false, alts = branches.toVector))
  }

  /** Mark the LAST added step as a greedy consecutive Kleene plus
    * (B+). Only the A B+ C shape compiles (middle step of three). */
  def oneOrMore(): PatternBuilder = {
    require(steps.nonEmpty, "oneOrMore needs a step to quantify")
    copy(steps = steps.init :+ steps.last.copy(oneOrMore = true))
  }

  /** Flink `timesOrMore(n)`: the LAST added step must repeat at least
    * `n` consecutive times — the Kleene form with a minimum run
    * length (compiled as cepKleene + an `n_b >= n` filter, which is
    * exact because n_b counts the whole maximal run). */
  def timesOrMore(n: Int): PatternBuilder = {
    require(steps.nonEmpty && n >= 1, "timesOrMore needs a step and n >= 1")
    copy(steps = steps.init :+ steps.last.copy(oneOrMore = true, minTimes = n))
  }

  /** Flink `until`: stop the oneOrMore loop at the first `pred` event
    * — the stopper terminates the loop but is NOT part of the match
    * ([[CepOps.cepKleeneUntil]]). Must follow a quantified step. */
  def until(name: String, pred: Column): PatternBuilder = {
    require(steps.nonEmpty && steps.last.oneOrMore,
      "until(...) must follow oneOrMore()/timesOrMore(n)")
    copy(untilPred = Some(pred))
  }

  /** Flink's DEFAULT relaxed contiguity for the quantified step
    * (`followedBy` + `oneOrMore()` without `.consecutive()`): every
    * loop PREFIX emits, closed by the first terminator after its last
    * loop event, bounded to the first `maxPrefix` prefixes per anchor
    * ([[CepOps.cepKleeneRelaxed]]; streaming twin
    * [[StreamOps.cepKleeneRelaxedStream]]). Must follow `oneOrMore()`;
    * contrast the default compilation (greedy consecutive maximal run,
    * skip past last row). */
  def relaxed(maxPrefix: Int): PatternBuilder = {
    require(steps.nonEmpty && steps.last.oneOrMore,
      "relaxed(maxPrefix) must follow oneOrMore()")
    require(maxPrefix >= 1, "maxPrefix must be >= 1")
    copy(relaxedMax = Some(maxPrefix))
  }

  /** The begin step must repeat exactly `n` times. */
  def times(n: Int): PatternBuilder = copy(nTimes = Some(n))

  /** Flink `times(from, to)`: the begin step repeats `n..m`
    * consecutive times — one match per qualifying (start, length)
    * window per length, tagged `reps`
    * ([[CepOps.cepTimesRange]]; requires `.consecutive()`). */
  def times(n: Int, m: Int): PatternBuilder =
    copy(nTimes = Some(n), nTimesHi = Some(m))

  /** Strict contiguity for [[times]] (no other event of the key in
    * between). */
  def consecutive(): PatternBuilder = copy(consecutive = true)

  /** SQL `A{n,m}? B` — the NON-GREEDY range: per run start, the
    * SHORTEST count in `n..m` whose tail a `postPred` event closes
    * (relaxed follow) wins. Terminal: returns the compiled form
    * directly ([[CepOps.cepTimesRangeReluctant]] documents the
    * tie-break contract). Requires `.times(n, m).consecutive()` and
    * `.within(...)` set first. */
  def reluctantlyFollowedBy(postName: String,
      postPred: Column): ClosedTimesRange =
    closedBy(postName, postPred, greedy = false, "reluctantlyFollowedBy")

  /** SQL `A{n,m} B` under the DEFAULT (greedy) quantifier / Flink
    * `.greedy()`: per run start, the LONGEST count whose tail a
    * `postPred` event closes wins — the argmax mirror of
    * [[reluctantlyFollowedBy]] ([[CepOps.cepTimesRangeGreedy]]). */
  def greedilyFollowedBy(postName: String,
      postPred: Column): ClosedTimesRange =
    closedBy(postName, postPred, greedy = true, "greedilyFollowedBy")

  private def closedBy(postName: String, postPred: Column,
      greedy: Boolean, face: String): ClosedTimesRange = {
    require(nTimes.isDefined && nTimesHi.isDefined && consecutive,
      s"$face needs .times(n, m).consecutive() first — " +
        "the greedy/reluctant axis quantifies a strict-contiguity range")
    val w = globalWithin.getOrElse(
      sys.error(s"$face pattern needs .within(...)"))
    requireNoAlts(face)
    new ClosedTimesRange(steps.head.pred, nTimes.get, nTimesHi.get, w,
      Vector(postName -> postPred), greedy)
  }

  /** No `pred`-matching event may follow the begin step inside the
    * `within` bound. */
  def notFollowedBy(name: String, pred: Column): PatternBuilder = {
    require(steps.size == 1 && nTimes.isEmpty,
      "notFollowedBy supports the single-anchor absence shape")
    copy(absent = Some((name, pred)))
  }

  /** Whole-match time bound (Kleene / times / absence shapes). */
  def within(d: String): PatternBuilder = copy(globalWithin = Some(d))

  // Alternation slots carry their full branch set in `alts`; every
  // compile case below except the dedicated cepAlternation one reads
  // only `steps(i).pred` (seeded with branches.head._2), so letting an
  // alts step through would SILENTLY drop every non-first branch.
  private def requireNoAlts(shape: String): Unit =
    require(steps.forall(_.alts.isEmpty),
      s"alternation slots (beginAny/nextAny) only compile the " +
        s"plain-sequence shape; $shape is not a compiled combination")

  /** Validate the assembled shape and run it over `ev`. */
  def over(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = (absent, nTimes) match {
    case (Some((_, abs)), None) =>
      requireNoAlts("notFollowedBy")
      val w = globalWithin.getOrElse(
        sys.error("absence pattern needs .within(...)"))
      CepOps.cepAbsence(ev, keyCol, tsCol, idCol, steps.head.pred, abs, w)
    case (None, Some(n)) =>
      requireNoAlts("times(n)")
      require(consecutive,
        "times(n) relaxed contiguity is cepPattern with n identical steps; " +
          "the DSL compiles the .consecutive() form")
      val w = globalWithin.getOrElse(
        sys.error("times pattern needs .within(...)"))
      nTimesHi match {
        case Some(m) =>
          CepOps.cepTimesRange(ev, keyCol, tsCol, idCol, steps.head.pred,
            n, m, w)
        case None =>
          CepOps.cepTimes(ev, keyCol, tsCol, idCol, steps.head.pred, n, w)
      }
    case (None, None) if untilPred.isDefined =>
      requireNoAlts("until")
      require(steps.size == 2 && steps(1).oneOrMore && !steps.head.oneOrMore,
        "until compiles the A B+ until(U) shape")
      val w = globalWithin.getOrElse(
        sys.error("until pattern needs .within(...)"))
      val k = CepOps.cepKleeneUntil(ev, keyCol, tsCol, idCol,
        steps(0).pred, steps(1).pred, untilPred.get, w)
      if (steps(1).minTimes > 1)
        k.filter(org.apache.spark.sql.functions.col("n_b") >= steps(1).minTimes)
      else k
    case (None, None) if steps.exists(_.oneOrMore) =>
      requireNoAlts("oneOrMore/timesOrMore")
      require(steps.size == 3 && steps(1).oneOrMore &&
        !steps.head.oneOrMore && !steps.last.oneOrMore &&
        steps.forall(!_.optional),
        "oneOrMore compiles the A B+ C shape (middle step quantified)")
      val w = globalWithin.getOrElse(
        sys.error("Kleene pattern needs .within(...)"))
      val k = relaxedMax match {
        case Some(mp) =>
          require(steps(1).minTimes == 1,
            "timesOrMore + relaxed is not a compiled combination")
          CepOps.cepKleeneRelaxed(ev, keyCol, tsCol, idCol,
            steps(0).pred, steps(1).pred, steps(2).pred, w, mp)
        case None => CepOps.cepKleene(ev, keyCol, tsCol, idCol,
          steps(0).pred, steps(1).pred, steps(2).pred, w)
      }
      if (steps(1).minTimes > 1)
        k.filter(org.apache.spark.sql.functions.col("n_b") >= steps(1).minTimes)
      else k
    case (None, None) if steps.exists(_.alts.nonEmpty) =>
      require(steps.forall(s => !s.optional && !s.oneOrMore) &&
        untilPred.isEmpty && !consecutive,
        "alternation slots compile the plain-sequence shape only")
      CepOps.cepAlternation(ev, keyCol, tsCol, idCol,
        steps.map(s => CepOps.AltStep(s.name,
          if (s.alts.nonEmpty) s.alts else Seq(s.name -> s.pred),
          s.within)))
    case (None, None) =>
      CepOps.cepPattern(ev, keyCol, tsCol, idCol,
        steps.map(s => PatternStep(s.name, s.pred, s.within, s.optional)))
    case _ => sys.error("unsupported pattern combination")
  }
}
