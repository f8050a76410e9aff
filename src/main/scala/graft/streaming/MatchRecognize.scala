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
  *  - `A{n}`          — single quantified variable →
  *                      [[CepOps.cepTimes]] (strict contiguity)
  *
  * `DEFINE <var> AS <spark-sql-expr>` binds each variable (exprs must
  * not contain top-level commas — wrap in parentheses if needed);
  * `WITHIN <interval>` accepts `INTERVAL '<n>' <UNIT>` or `<n> <unit>`.
  *
  * Semantics note: SQL `WITHIN` bounds the WHOLE match. For the
  * sequence shape this compiles as per-step bounds of the full
  * interval plus a closing `total_us` filter — equivalent, because a
  * total within Δt implies every step gap is within Δt and the filter
  * removes the rest. Kleene/times shapes bound the whole match
  * natively.
  */
object MatchRecognize {

  private val PatternRe = raw"(?is)PATTERN\s*\(([^)]*)\)".r.unanchored
  private val DefineRe = raw"(?is)DEFINE\s+(.*?)\s*(?:WITHIN\s+.*)?$$".r.unanchored
  private val WithinRe = raw"(?is)WITHIN\s+(.+?)\s*$$".r.unanchored
  private val TokenRe = raw"([A-Za-z_][A-Za-z0-9_]*)([+?]|\{(\d+)\})?".r
  private val IntervalRe = raw"(?i)(?:INTERVAL\s+)?'?(\d+)'?\s+([A-Za-z]+)".r

  private case class Tok(name: String, quant: String)

  def apply(ev: DataFrame, keyCol: String, tsCol: String, idCol: String,
      clause: String): DataFrame = {
    val pat = PatternRe.findFirstMatchIn(clause)
      .getOrElse(sys.error("MATCH_RECOGNIZE needs PATTERN (...)")).group(1).trim
    val defs = DefineRe.findFirstMatchIn(clause)
      .getOrElse(sys.error("MATCH_RECOGNIZE needs DEFINE ...")).group(1).trim
    val within = WithinRe.findFirstMatchIn(clause).map(_.group(1).trim)

    val toks = pat.split(raw"\s+").toSeq.filter(_.nonEmpty).map {
      case TokenRe(name, q, n) =>
        Tok(name, Option(q).map(x => if (x.startsWith("{")) n else x).getOrElse(""))
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
    val undefined = toks.map(_.name).filterNot(binds.contains)
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

    toks match {
      case Seq(Tok(a, "")) if toks.size == 1 =>
        sys.error("single plain variable is a filter, not a pattern")
      case Seq(Tok(a, n)) if n.forall(_.isDigit) && n.nonEmpty =>
        CepOps.cepTimes(ev, keyCol, tsCol, idCol, binds(a), n.toInt, normWithin)
      case Seq(Tok(a, ""), Tok(b, "+"), Tok(c, "")) =>
        CepOps.cepKleene(ev, keyCol, tsCol, idCol,
          binds(a), binds(b), binds(c), normWithin)
      case _ if toks.forall(t => t.quant == "" || t.quant == "?") =>
        require(toks.head.quant == "" && toks.last.quant == "",
          "first and last pattern variables must be required")
        val w = normWithin
        val us = withinUs
        CepOps.cepPattern(ev, keyCol, tsCol, idCol,
            toks.map(t => PatternStep(t.name, binds(t.name), w,
              optional = t.quant == "?")))
          .filter(col("total_us") <= us)
      case _ =>
        sys.error(s"unsupported PATTERN shape '$pat' — supported: " +
          "plain/optional sequence, A B+ C, A{n}")
    }
  }
}
