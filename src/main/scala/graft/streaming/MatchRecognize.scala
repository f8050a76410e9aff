package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL-string face over the CEP operators — the `MATCH_RECOGNIZE`
  * subset Flink SQL users actually type, compiled onto the same
  * operators as [[Pattern]] (no new engine, no new semantics):
  *
  * {{{
  * MatchRecognize(events, "user_id", "ts", "event_id",
  *   """PATTERN (A B+ C)
  *      DEFINE A AS event_type = 'view',
  *             B AS event_type = 'click',
  *             C AS event_type = 'purchase'
  *      WITHIN INTERVAL '360' MINUTE""")
  * }}}
  *
  * Supported PATTERN grammar (whitespace-separated variables):
  *  - `A B C …`       — plain sequence → [[CepOps.cepPattern]]
  *  - `B?`            — optional step (inside a sequence)
  *  - `A B+ C`        — exactly-three with a middle Kleene plus →
  *                      [[CepOps.cepKleene]] (greedy consecutive,
  *                      skip past last row)
  *  - `A B+? C`       — RELAXED-contiguity Kleene →
  *                      [[CepOps.cepKleeneRelaxed]]: Flink's default
  *                      `followedBy … oneOrMore` semantics (loop events
  *                      need not be adjacent; every prefix 1..maxPrefix
  *                      of each anchor's loop closes at its first
  *                      in-horizon terminator). The `+?` marker is
  *                      reluctant-quantifier SYNTAX repurposed — Flink
  *                      SQL's own `B+?` (reluctant) differs; the
  *                      divergence and the `relaxedPrefix` bound (the
  *                      same cap as the Pattern DSL's `.relaxed(k)`)
  *                      are this face's documented contract
  *  - `A{n}`          — single quantified variable →
  *                      [[CepOps.cepTimes]] (strict contiguity)
  *  - `A (B|C) D`     — NAMED ALTERNATION group →
  *                      [[CepOps.cepAlternation]]: the slot matches any
  *                      branch, output columns `B_or_C_id` +
  *                      `B_or_C_branch` (the matched branch's name —
  *                      the `CLASSIFIER()` analogue, identity a plain
  *                      OR-DEFINE loses). Combines with plain variables
  *                      only
  *  - `(A B){n}`      — quantified SEQUENCE group, fixed count →
  *                      [[CepOps.cepGroupTimes]] (unrolled to a flat
  *                      2n-slot chain, relaxed contiguity); MIXES with
  *                      plain outer variables — `A (B C){n} D` →
  *                      [[CepOps.cepGroupTimesMixed]] (the outer steps
  *                      join the unrolled chain)
  *  - `(A B){n,m}`    — quantified SEQUENCE group, bounded range →
  *                      [[CepOps.cepGroupRange]]: one match per
  *                      repetition count in n..m, per-repetition
  *                      columns null-padded to the m-shape plus a
  *                      `reps` count; standalone only
  *  - `A{n,m} B [C …]` — GREEDY range (SQL's DEFAULT quantifier) →
  *                      [[CepOps.cepTimesRangeGreedy]]: per run
  *                      start, the LONGEST count whose tail the post
  *                      CHAIN completes wins (argmax mirror of
  *                      `{n,m}?`)
  *  - `A{n,m}? B [C …]` — RELUCTANT range (SQL non-greedy) →
  *                      [[CepOps.cepTimesRangeReluctant]]: per run
  *                      start, the SHORTEST count whose tail the post
  *                      chain completes wins. Unlike `B+?`
  *                      (relaxed-Kleene syntax repurposed, above),
  *                      `{n,m}?` carries SQL's actual non-greedy
  *                      meaning; the tie-break contract is documented
  *                      on the kernel
  *  - `[A …] (B C){n,m}? D …` — RELUCTANT group range →
  *                      [[CepOps.cepGroupRangeReluctant]]: per-anchor
  *                      shortest count whose chain the following
  *                      plain variables complete; plain variables may
  *                      precede the group (the anchor is then the
  *                      match start's event — the anchor-identity
  *                      contract on the kernel)
  *  - `[A …] (B C){n,m} D …` — GREEDY group range →
  *                      [[CepOps.cepGroupRangeGreedy]]: the argmax
  *                      mirror, same anchor-identity contract; the
  *                      STANDALONE `(A B){n,m}` keeps Flink's
  *                      all-counts emission (below) instead
  *  - `(A B)+`        — group Kleene → [[CepOps.cepGroupKleene]]: one
  *                      match per repetition count, unrolled to
  *                      `groupMaxReps` (a HARD bound — candidate growth
  *                      is exponential in slots, so longer runs fail
  *                      the cap loudly rather than silently truncate);
  *                      output `(key, first_id, last_id, reps,
  *                      total_us)`; standalone only
  *
  * `DEFINE <var> AS <spark-sql-expr>` binds each variable (exprs must
  * not contain top-level commas — wrap in parentheses if needed);
  * `WITHIN <interval>` accepts `INTERVAL '<n>' <UNIT>` or `<n> <unit>`.
  *
  * `MEASURES COUNT(B.*) AS n, SUM(B.value) AS sv, AVG(B.value) AS av,
  * FIRST(B.<idCol>) AS f, LAST(B.<idCol>) AS l` (standard position:
  * before PATTERN) is supported on the `A B+ C` shape over the loop
  * variable, compiled onto [[CepOps.cepKleeneMeasures]] — the
  * aggregates ride the run-grouping pass, zero extra shuffles. On a
  * plain (optional-allowed) sequence and on the 2-step AFTER MATCH
  * SKIP shapes, FIRST/LAST/(0-or-1) COUNT per variable are pure
  * renames of the per-step ids; on `A{n}`, COUNT(A.*) is the literal
  * `n` and FIRST/LAST are the run-edge ids. SUM/AVG need a loop
  * variable and are rejected on every non-Kleene shape.
  *
  * `AFTER MATCH SKIP TO NEXT ROW` / `AFTER MATCH SKIP PAST LAST ROW`
  * (standard position: before PATTERN) route a 2-step sequence to
  * [[CepOps.cepSkipToNext]] / [[CepOps.cepSkipPastLast]]; on `A B+ C`
  * the PAST LAST form is accepted redundantly (Kleene's native
  * semantics). Without the clause, sequences keep NO_SKIP (every
  * combination), Flink's default.
  *
  * Semantics note: SQL `WITHIN` bounds the WHOLE match. For the
  * sequence shape this compiles as per-step bounds of the full
  * interval plus a closing `total_us` filter — equivalent, because a
  * total within Δt implies every step gap is within Δt and the filter
  * removes the rest. Kleene/times shapes bound the whole match
  * natively.
  */
object MatchRecognize {

  private val PatternRe =
    raw"(?is)PATTERN\s*\(((?:[^()]|\([^()]*\))*)\)".r.unanchored
  private val MeasuresRe = raw"(?is)MEASURES\s+(.*?)\s*(?=PATTERN|AFTER\s+MATCH)".r.unanchored
  private val MeasureItemRe =
    raw"(?i)(COUNT|SUM|AVG|FIRST|LAST)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*(\*|[A-Za-z_][A-Za-z0-9_]*)\s*\)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)".r
  private val DefineRe = raw"(?is)DEFINE\s+(.*?)\s*(?:WITHIN\s+.*)?$$".r.unanchored
  private val WithinRe = raw"(?is)WITHIN\s+(.+?)\s*$$".r.unanchored
  private val TokenRe =
    raw"([A-Za-z_][A-Za-z0-9_]*)(\+\?|[+?]|\{(\d+(?:,\d+)?)\}\??)?".r
  private val GroupTokRe = raw"\(([^()]*)\)(\+\?|[+?]|\{\d+(?:,\d+)?\}\??)?".r
  private val TokSplitRe = raw"\([^()]*\)(?:\+\?|[+?]|\{\d+(?:,\d+)?\}\??)?|\S+".r
  private val IntervalRe = raw"(?i)(?:INTERVAL\s+)?'?(\d+)'?\s+([A-Za-z]+)".r
  private val SkipRe =
    raw"(?is)AFTER\s+MATCH\s+SKIP\s+(TO\s+NEXT\s+ROW|PAST\s+LAST\s+(?:ROW|EVENT))".r.unanchored

  private case class Tok(name: String, quant: String,
      branches: Seq[String] = Nil)

  def apply(ev: DataFrame, keyCol: String, tsCol: String, idCol: String,
      clause: String, relaxedPrefix: Int = 3,
      groupMaxReps: Int = 3): DataFrame = {
    // AFTER MATCH SKIP … sits before PATTERN in standard SQL; strip it
    // out of the clause before the other extractors see it
    val skip = SkipRe.findFirstMatchIn(clause)
      .map(_.group(1).toUpperCase.replaceAll(raw"\s+", " "))
    val rest = SkipRe.replaceAllIn(clause, "")
    val pat = PatternRe.findFirstMatchIn(rest)
      .getOrElse(sys.error("MATCH_RECOGNIZE needs PATTERN (...)")).group(1).trim
    val defs = DefineRe.findFirstMatchIn(rest)
      .getOrElse(sys.error("MATCH_RECOGNIZE needs DEFINE ...")).group(1).trim
    val within = WithinRe.findFirstMatchIn(rest).map(_.group(1).trim)

    val toks = TokSplitRe.findAllIn(pat).toSeq.map {
      case GroupTokRe(inner, q) =>
        val isAlt = inner.contains("|")
        val names =
          (if (isAlt) inner.split(raw"\|").toSeq else
            inner.trim.split(raw"\s+").toSeq).map(_.trim)
        require(names.size >= 2 && names.forall(n =>
            raw"[A-Za-z_][A-Za-z0-9_]*".r.pattern.matcher(n).matches()),
          s"a group must hold two or more plain variables: ($inner)")
        if (isAlt) {
          if (q != null)
            sys.error(s"alternation groups take no quantifier: ($inner)$q")
          Tok(names.mkString("_or_"), "", names)
        } else q match {
          // quantified SEQUENCE group: (A B){n} / (A B)+ — the Flink
          // group-pattern times/oneOrMore shapes
          case null => sys.error(s"a sequence group needs {n} or + : ($inner)")
          case "+" => Tok(names.mkString("_"), "G+", names)
          case s if s.startsWith("{") =>
            Tok(names.mkString("_"), "G" + s, names)
          case s => sys.error(s"unsupported group quantifier ($inner)$s " +
            "— {n}, {n,m} and + compile")
        }
      case TokenRe(name, q, n) =>
        // {n,m}? keeps its reluctant marker on the inner spec ("n,m?")
        Tok(name, Option(q).map(x =>
          if (x.startsWith("{")) (if (x.endsWith("?")) n + "?" else n)
          else x).getOrElse(""))
      case t => sys.error(s"unsupported pattern token '$t'")
    }
    require(toks.nonEmpty, "empty PATTERN")

    // split definitions on commas that start a fresh `<var> AS` binding
    val binds: Map[String, Column] = defs
      .split(raw"(?i),\s*(?=[A-Za-z_][A-Za-z0-9_]*\s+AS\s)").toSeq
      .map { d =>
        val m = raw"(?is)([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(.+)".r
          .findFirstMatchIn(d.trim)
          .getOrElse(sys.error(s"bad DEFINE entry '$d'"))
        m.group(1) -> expr(m.group(2).trim)
      }.toMap
    val undefined = toks.flatMap(t =>
      if (t.branches.nonEmpty) t.branches else Seq(t.name))
      .filterNot(binds.contains)
    require(undefined.isEmpty, s"PATTERN vars not in DEFINE: $undefined")

    def normWithin: String = {
      val w = within.getOrElse(sys.error("this shape needs WITHIN"))
      IntervalRe.findFirstMatchIn(w) match {
        case Some(m) => s"${m.group(1)} ${m.group(2)}"
        case None => sys.error(s"cannot parse WITHIN '$w'")
      }
    }
    def withinUs: Long = {
      val Array(n, unit) = normWithin.split(" ")
      val mult = unit.toLowerCase.stripSuffix("s") match {
        case "second" => 1000000L
        case "minute" => 60L * 1000000L
        case "hour" => 3600L * 1000000L
        case "day" => 86400L * 1000000L
        case u => sys.error(s"unsupported WITHIN unit '$u'")
      }
      n.toLong * mult
    }

    // AFTER MATCH SKIP routes a 2-step sequence to the dedicated
    // strategy operators; other shapes keep their native semantics
    // (Kleene is skip-past-last by construction; NO_SKIP otherwise).
    // MEASURES on these shapes: each variable binds exactly one event,
    // so FIRST/LAST/COUNT are pure renames (see [[stepMeasures]]).
    (skip, toks) match {
      case (Some(s), Seq(Tok(a, "", Seq()), Tok(b, "", Seq()))) if s.startsWith("TO NEXT") =>
        val base = CepOps.cepSkipToNext(ev, keyCol, tsCol, idCol,
            binds(a), binds(b), normWithin)
          .select(col(keyCol), col("a_id").as(s"${a}_id"),
            col("b_id").as(s"${b}_id"), col("gap_us").as("total_us"))
        return stepMeasures(base, measureItems(rest), Seq(a, b), idCol,
          keyCol, spanCol = Some("total_us"))
      case (Some(s), Seq(Tok(a, "", Seq()), Tok(b, "", Seq()))) if s.startsWith("PAST LAST") =>
        val base = CepOps.cepSkipPastLast(ev, keyCol, tsCol, idCol,
            binds(a), binds(b), withinUs)
          .select(col(keyCol), col("a_id").as(s"${a}_id"),
            col("b_id").as(s"${b}_id"))
        return stepMeasures(base, measureItems(rest), Seq(a, b), idCol,
          keyCol, spanCol = None)
      case (Some(s), Seq(Tok(_, "", Seq()), Tok(_, "+", Seq()), Tok(_, "", Seq()))) if s.startsWith("PAST LAST") =>
        () // Kleene's native semantics ARE skip-past-last — fall through
      case (Some(s), _) =>
        sys.error(s"AFTER MATCH SKIP $s is only supported for 2-step " +
          "sequences (or redundantly on A B+ C, whose semantics are " +
          "already skip-past-last)")
      case (None, _) => ()
    }

    toks match {
      case Seq(Tok(a, "", Seq())) if toks.size == 1 =>
        sys.error("single plain variable is a filter, not a pattern")
      case Tok(a, spec, Seq()) +: tl if spec.matches(raw"\d+,\d+\?") &&
          tl.nonEmpty && tl.forall(t => t.quant == "" && t.branches.isEmpty) =>
        // A{n,m}? B [C …] — RELUCTANT range: per run start, the
        // shortest count whose tail the post CHAIN completes wins
        // (cepTimesRangeReluctant documents the tie-break contract).
        // NOTE the contrast with B+? (relaxed-Kleene syntax
        // repurposed, above): {n,m}? is the one place this face
        // carries SQL's actual non-greedy meaning.
        require(measureItems(rest).isEmpty,
          "MEASURES is not supported with A{n,m}?; the reps column " +
            "carries the per-match count")
        val Array(lo, hi) = spec.stripSuffix("?").split(",").map(_.toInt)
        CepOps.cepTimesRangeReluctant(ev, keyCol, tsCol, idCol, binds(a),
          lo, hi, normWithin, tl.map(t => t.name -> binds(t.name)))
      case Tok(a, spec, Seq()) +: tl if spec.matches(raw"\d+,\d+") &&
          tl.nonEmpty && tl.forall(t => t.quant == "" && t.branches.isEmpty) =>
        // A{n,m} B [C …] — SQL's DEFAULT quantifier is GREEDY: the
        // longest count per run start whose tail the post chain
        // completes wins (cepTimesRangeGreedy — the argmax mirror).
        require(measureItems(rest).isEmpty,
          "MEASURES is not supported with A{n,m} B; the reps column " +
            "carries the per-match count")
        val Array(lo, hi) = spec.split(",").map(_.toInt)
        CepOps.cepTimesRangeGreedy(ev, keyCol, tsCol, idCol, binds(a),
          lo, hi, normWithin, tl.map(t => t.name -> binds(t.name)))
      case Seq(Tok(a, spec, Seq())) if spec.matches(raw"\d+,\d+\?") =>
        sys.error(s"$a{n,m}? without a following variable always matches " +
          s"the minimal count — use $a{n}, or the greedy $a{n,m} for the " +
          "all-counts emission")
      case Seq(Tok(a, spec, Seq())) if spec.matches(raw"\d+,\d+") =>
        // A{n,m} — bounded range with strict contiguity: one match per
        // (start, length) window per length, tagged reps; MEASURES is
        // rejected (reps varies per match — it IS the count column)
        require(measureItems(rest).isEmpty,
          "MEASURES is not supported with A{n,m}; the reps column " +
            "carries the per-match count")
        val Array(lo, hi) = spec.split(",").map(_.toInt)
        CepOps.cepTimesRange(ev, keyCol, tsCol, idCol, binds(a),
          lo, hi, normWithin)
      case Seq(Tok(a, n, Seq())) if n.forall(_.isDigit) && n.nonEmpty =>
        val base = CepOps.cepTimes(ev, keyCol, tsCol, idCol, binds(a),
          n.toInt, normWithin)
        // MEASURES on A{n}: the run has exactly n events, so COUNT is
        // the literal n and FIRST/LAST are the existing run-edge ids
        val items = measureItems(rest)
        if (items.isEmpty) base
        else {
          val renamed = items.map {
            case ("FIRST", v, c, as) =>
              require(v == a && c == idCol,
                s"MEASURES FIRST supports $a.$idCol on this shape")
              col("first_id").as(as)
            case ("LAST", v, c, as) =>
              require(v == a && c == idCol,
                s"MEASURES LAST supports $a.$idCol on this shape")
              col("last_id").as(as)
            case ("COUNT", v, c, as) =>
              require(v == a && c == "*", s"use COUNT($a.*)")
              lit(n.toLong).as(as)
            case (f, _, _, _) =>
              sys.error(s"MEASURES $f is not supported on A{n} " +
                "(FIRST/LAST/COUNT only)")
          }
          base.select(Seq(col(keyCol)) ++ renamed :+ col("span_us"): _*)
        }
      case Seq(Tok(a, "", Seq()), Tok(b, "+?", Seq()), Tok(c, "", Seq())) =>
        measures(rest, b, idCol) match {
          case Nil =>
            CepOps.cepKleeneRelaxed(ev, keyCol, tsCol, idCol,
              binds(a), binds(b), binds(c), normWithin, relaxedPrefix)
          case ms =>
            val valueCols = ms.collect {
              case ("SUM", c0, _) => c0
              case ("AVG", c0, _) => c0
            }.distinct
            require(valueCols.size <= 1,
              s"MEASURES SUM/AVG must agree on one column, got $valueCols")
            val base = CepOps.cepKleeneRelaxedMeasures(ev, keyCol, tsCol,
              idCol, binds(a), binds(b), binds(c), normWithin, relaxedPrefix,
              valueCol = expr(valueCols.headOption.getOrElse(idCol)))
            val renamed = ms.map {
              case ("COUNT", _, as) => col("n_b").as(as)
              case ("SUM", _, as) => col("sum_b").as(as)
              case ("AVG", _, as) => col("avg_b").as(as)
              case ("FIRST", _, as) => col("first_b_id").as(as)
              case ("LAST", _, as) => col("last_b_id").as(as)
            }
            base.select(Seq(col(keyCol), col("a_id"), col("c_id"),
              col("span_us")) ++ renamed: _*)
        }
      case Seq(Tok(a, "", Seq()), Tok(b, "+", Seq()), Tok(c, "", Seq())) =>
        measures(rest, b, idCol) match {
          case Nil =>
            CepOps.cepKleene(ev, keyCol, tsCol, idCol,
              binds(a), binds(b), binds(c), normWithin)
          case ms =>
            val valueCols = ms.collect {
              case ("SUM", c0, _) => c0
              case ("AVG", c0, _) => c0
            }.distinct
            require(valueCols.size <= 1,
              s"MEASURES SUM/AVG must agree on one column, got $valueCols")
            val base = CepOps.cepKleeneMeasures(ev, keyCol, tsCol, idCol,
              binds(a), binds(b), binds(c), normWithin,
              valueCol = expr(valueCols.headOption.getOrElse(idCol)))
            val renamed = ms.map {
              case ("COUNT", _, as) => col("n_b").as(as)
              case ("SUM", _, as) => col("sum_b").as(as)
              case ("AVG", _, as) => col("avg_b").as(as)
              case ("FIRST", _, as) => col("first_b_id").as(as)
              case ("LAST", _, as) => col("last_b_id").as(as)
            }
            base.select(Seq(col(keyCol), col("a_id"), col("c_id"),
              col("span_us")) ++ renamed: _*)
        }
      case ts0 if ts0.count(t => t.branches.nonEmpty &&
            t.quant.startsWith("G{") && t.quant.contains(",")) == 1 &&
          // the comma-quantified group must be the ONLY G-quantified
          // token: a fixed-count group alongside it (e.g. '(a b){2}
          // (c d){1,2} e') would otherwise slip past the plain-token
          // filter below and get rejected with the WRONG group named —
          // the mixed-group pattern belongs to the catch-all mix error
          ts0.count(_.quant.startsWith("G")) == 1 &&
          // a standalone greedy range is the all-counts form (below);
          // a standalone RELUCTANT one still enters for its clear reject
          (ts0.size > 1 || ts0.head.quant.endsWith("}?")) &&
          ts0.filterNot(t => t.quant.startsWith("G{"))
            .forall(t => t.quant == "" && t.branches.isEmpty) =>
        // [A …] (B C){n,m}? D… / [A …] (B C){n,m} D… — the CLOSED
        // group-range axis: reluctant ({n,m}? — per-anchor SHORTEST
        // count) or greedy ({n,m} — SQL's default, per-anchor LONGEST
        // count) decided by the post variables that complete the
        // chain. Plain variables may PRECEDE the group — the anchor
        // is then the MATCH START's event (pre.head), per the
        // anchor-identity contract cepGroupRangeReluctant documents —
        // and at least one plain variable must FOLLOW it (a standalone
        // reluctant range is exactly the fixed {n} form; a standalone
        // greedy range is the all-counts {n,m} under a per-anchor
        // max). The whole-match WITHIN bound prunes candidates BEFORE
        // the per-anchor pick (filter-after-argmin would wrongly drop
        // anchors whose minimal count busts the bound but whose
        // longer in-bound completion exists).
        require(measureItems(rest).isEmpty,
          "MEASURES is not supported with group quantifiers; every " +
            "bound event is already a column")
        val gi = ts0.indexWhere(_.quant.startsWith("G{"))
        val preToks = ts0.take(gi)
        val gTok = ts0(gi)
        val postToks = ts0.drop(gi + 1)
        require(postToks.nonEmpty && postToks.forall(t =>
            t.quant == "" && t.branches.isEmpty),
          s"(${gTok.name}){n,m} range quantifiers need at least one " +
            "PLAIN following variable to decide against and mix with " +
            "plain variables only")
        val reluctant = gTok.quant.endsWith("}?")
        val spec = gTok.quant.drop(2)
          .dropRight(if (reluctant) 2 else 1) // "G{n,m}[?]" -> "n,m"
        val Array(lo, hi) = spec.split(",").map(_.trim.toInt)
        val grp = gTok.branches.map(b => b -> binds(b))
        val pre = preToks.map(t => t.name -> binds(t.name))
        val post = postToks.map(t => t.name -> binds(t.name))
        if (reluctant)
          CepOps.cepGroupRangeReluctant(ev, keyCol, tsCol, idCol, grp,
            lo, hi, normWithin, post, pre, matchWithinUs = Some(withinUs))
        else
          CepOps.cepGroupRangeGreedy(ev, keyCol, tsCol, idCol, grp,
            lo, hi, normWithin, post, pre, matchWithinUs = Some(withinUs))
      case Seq(t) if t.branches.nonEmpty && t.quant.startsWith("G") =>
        // quantified SEQUENCE group `(A B){n}` / `(A B)+` →
        // cepGroupTimes / cepGroupKleene (standalone only — the whole
        // PATTERN is the group). WITHIN bounds the whole match; the
        // per-step bound is the full interval, closed by total_us.
        require(measureItems(rest).isEmpty,
          "MEASURES is not supported with group quantifiers; {n} binds " +
            "every repetition's events as columns, + carries " +
            "first_id/last_id/reps")
        val grp = t.branches.map(b => b -> binds(b))
        val base =
          if (t.quant == "G+")
            CepOps.cepGroupKleene(ev, keyCol, tsCol, idCol, grp,
              groupMaxReps, normWithin)
          else t.quant.drop(2).dropRight(1) match {
            // "{n,m}" — bounded range, one match per count, columns
            // null-padded to the m-shape (cepGroupRange)
            case spec if spec.contains(",") =>
              val Array(lo, hi) = spec.split(",").map(_.trim.toInt)
              CepOps.cepGroupRange(ev, keyCol, tsCol, idCol, grp,
                lo, hi, normWithin)
            case spec =>
              CepOps.cepGroupTimes(ev, keyCol, tsCol, idCol, grp,
                spec.toInt, normWithin)
          }
        base.filter(col("total_us") <= withinUs)
      case _ if toks.count(_.quant.startsWith("G")) == 1 &&
          toks.find(_.quant.startsWith("G")).get.quant != "G+" &&
          !toks.find(_.quant.startsWith("G")).get.quant.contains(",") &&
          !toks.find(_.quant.startsWith("G")).get.quant.endsWith("?") &&
          toks.filterNot(_.quant.startsWith("G"))
            .forall(t => t.quant == "" && t.branches.isEmpty) =>
        // MIXED fixed-count group `A (B C){n} D` → cepGroupTimesMixed:
        // the group unrolls and the outer plain variables join the
        // same flat chain. WITHIN bounds the whole match (per-step
        // bound = full interval, closed by total_us), as everywhere.
        require(measureItems(rest).isEmpty,
          "MEASURES is not supported with group quantifiers; every " +
            "bound event is already a column")
        val gi = toks.indexWhere(_.quant.startsWith("G"))
        val g = toks(gi)
        val base = CepOps.cepGroupTimesMixed(ev, keyCol, tsCol, idCol,
          pre = toks.take(gi).map(t => t.name -> binds(t.name)),
          group = g.branches.map(b => b -> binds(b)),
          n = g.quant.drop(2).dropRight(1).toInt,
          post = toks.drop(gi + 1).map(t => t.name -> binds(t.name)),
          within = normWithin)
        base.filter(col("total_us") <= withinUs)
      case _ if toks.exists(t => t.quant.startsWith("G")) =>
        sys.error("unsupported group-quantifier mix: (A B){n} and the " +
          "closed ranges [pre…] (A B){n,m}[?] D… combine with PLAIN " +
          "outer variables only (ranges need at least one FOLLOWING " +
          "variable to decide against), (A B)+ must be the entire " +
          "PATTERN (its per-repetition unions would multiply by the " +
          "outer chain), and (A B){n}? is not a range — a fixed-count " +
          "reluctant group is exactly (A B){n}")
      case _ if toks.exists(_.branches.nonEmpty) =>
        // named alternation `A (B|C) D` → cepAlternation; the group
        // slot's output columns are `<b1>_or_<b2>_id` + `_branch` (the
        // CLASSIFIER() analogue). WITHIN bounds the whole match: the
        // per-step bound is the full interval, closed by total_us.
        require(toks.forall(_.quant == ""),
          "alternation groups combine with plain variables only " +
            "(no ?/+/{n} quantifiers)")
        require(measureItems(rest).isEmpty,
          "MEASURES is not supported with alternation groups; the " +
            "<slot>_branch column carries the matched branch")
        val w = normWithin
        val base = CepOps.cepAlternation(ev, keyCol, tsCol, idCol,
          toks.map(t => CepOps.AltStep(t.name,
            if (t.branches.nonEmpty) t.branches.map(b => b -> binds(b))
            else Seq(t.name -> binds(t.name)), w)))
        base.filter(col("total_us") <= withinUs)
      case _ if toks.forall(t => t.quant == "" || t.quant == "?") =>
        require(toks.head.quant == "" && toks.last.quant == "",
          "first and last pattern variables must be required")
        val w = normWithin
        val us = withinUs
        val base = CepOps.cepPattern(ev, keyCol, tsCol, idCol,
            toks.map(t => PatternStep(t.name, binds(t.name), w,
              optional = t.quant == "?")))
          .filter(col("total_us") <= us)
        // MEASURES on a plain sequence: each variable matches exactly
        // one event (or none, if optional), so FIRST == LAST == the
        // step's id and COUNT(V.*) is its 0/1 presence; run aggregates
        // (SUM/AVG) need a loop variable and are rejected here
        stepMeasures(base, measureItems(rest), toks.map(_.name), idCol,
          keyCol, spanCol = Some("total_us"))
      case _ =>
        sys.error(s"unsupported PATTERN shape '$pat' — supported: " +
          "plain/optional sequence, A B+ C, A B+? C (relaxed), A{n}")
    }
  }

  /** MEASURES on shapes where every variable binds at most ONE event
    * (plain/optional sequences, the 2-step SKIP strategies): FIRST and
    * LAST are the step's id, COUNT(V.*) its 0/1 presence. Run
    * aggregates (SUM/AVG) need a loop variable and are rejected.
    * `spanCol` appends the shape's span/gap column when it has one. */
  private def stepMeasures(base: DataFrame,
      items: List[(String, String, String, String)], names: Seq[String],
      idCol: String, keyCol: String, spanCol: Option[String]): DataFrame =
    if (items.isEmpty) base
    else {
      val nameSet = names.toSet
      val renamed = items.map {
        case ("FIRST" | "LAST", v, c, as) =>
          require(nameSet.contains(v), s"MEASURES variable '$v' not in PATTERN")
          require(c == idCol, s"FIRST/LAST support the id column '$idCol'")
          col(s"${v}_id").as(as)
        case ("COUNT", v, c, as) =>
          require(nameSet.contains(v) && c == "*", s"use COUNT($v.*)")
          when(col(s"${v}_id").isNull, lit(0L)).otherwise(lit(1L)).as(as)
        case (f, v, _, _) =>
          sys.error(s"MEASURES $f($v.…) needs a loop variable (B+); " +
            "this shape supports FIRST/LAST/COUNT only")
      }
      base.select(Seq(col(keyCol)) ++ renamed ++ spanCol.map(col).toSeq: _*)
    }

  /** Parse the MEASURES clause into `(func, variable, column, alias)`
    * 4-tuples — shape-independent; each PATTERN branch validates which
    * functions/variables it supports. */
  private def measureItems(clause: String): List[(String, String, String, String)] =
    MeasuresRe.findFirstMatchIn(clause).map { m =>
      m.group(1).split(",").toList.map(_.trim).filter(_.nonEmpty).map {
        case MeasureItemRe(f, v, c, as) => (f.toUpperCase, v, c, as)
        case item => sys.error(s"unsupported MEASURES item '$item'")
      }
    }.getOrElse(Nil)

  /** Kleene-shape MEASURES: the LOOP variable only — `COUNT(B.*)`,
    * `SUM(B.col)`, `AVG(B.col)`, `FIRST/LAST(B.<idCol>)` — compiled
    * onto [[CepOps.cepKleeneMeasures]]' run-grouping aggregate. */
  private def measures(clause: String, loopVar: String,
      idCol: String): List[(String, String, String)] =
    measureItems(clause).map { case (fn, v, c, as) =>
      require(v == loopVar,
        s"MEASURES only supports the loop variable '$loopVar', got '$v'")
      fn match {
        case "COUNT" =>
          require(c == "*", s"use COUNT($loopVar.*), got $c")
        case "FIRST" | "LAST" =>
          require(c == idCol,
            s"$fn supports the id column '$idCol', got '$c'")
        case _ => ()
      }
      (fn, c, as)
    }
}
