package graft.queries

import graft.{Q, Tables}
import graft.functions.Hashes
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Fixture-bound oracle keys for text analysis (SURVEY.md §2.10 L4/L6 +
  * the training-data-pipeline set). Algorithms live in the parameterized
  * [[graft.operators.TextOps]]; each key binds them to `documents`.
  *
  * The synthetic corpus draws every language's text from one shared
  * 31-token vocabulary (verified), so the language-ID key checks the
  * *mechanism* (deterministic lexicon scoring), not labeling accuracy —
  * with real multilingual text the same pipeline carries per-language
  * lexicons.
  */
object TextQueries {

  private val wordcount = Q(
    "llm_wordcount",
    """SELECT tok, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok ORDER BY tok""".stripMargin) { (s, d) =>
    TextOps.wordcount(Tables.documents(s, d)).orderBy("tok")
  }

  private val tokenCount = Q(
    "llm_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_alpha,
      |  CAST(length(text) AS INT) AS n_chars_calc
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextOps.tokenCounts(Tables.documents(s, d)).orderBy("doc_id")
  }

  private val fingerprint = Q(
    "llm_fingerprint",
    s"""SELECT doc_id, ${Hashes.oPolyHash("text")} AS fp
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextOps.fingerprint(Tables.documents(s, d)).orderBy("doc_id")
  }

  private val langId = Q(
    "llm_lang_id",
    """SELECT doc_id,
      |  round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the'))) AS DOUBLE)
      |        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS en_ratio,
      |  CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the'))) AS DOUBLE)
      |            / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.1
      |       THEN 'en' ELSE 'unk' END AS pred
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextOps.langId(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** Tie-proof micro-unit scores — see [[TextOps.quality]]: `floor(1e6·x)`
    * because `round(x, 6)`'s tie rule differs across engines (Spark
    * HALF_UP on the shortest decimal string vs DuckDB binary nearest)
    * and sf0.1 hit an exact `.xxxxxx5` tie; floor has no tie rule. */
  private val quality = Q(
    "llm_quality_score",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
      |  CAST(floor(1000000 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |        / CAST(len(string_split(text, ' ')) AS DOUBLE))) AS BIGINT) AS ttr_u,
      |  CAST(floor(1000000 * (
      |    0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |    + 0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
      |    + 0.2 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |                   / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 10.0, 1.0))) AS BIGINT) AS score_u
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextOps.quality(Tables.documents(s, d)).orderBy("doc_id")
  }

  private val keywordScore = Q(
    "llm_keyword_score",
    """WITH lex(tok, w) AS (VALUES ('slow', -2), ('fast', 2), ('big', 1), ('small', -1), ('merge', 3)),
      |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |s AS (SELECT doc_id, sum(w) AS sc FROM t JOIN lex USING (tok) GROUP BY doc_id)
      |SELECT d.doc_id, CAST(coalesce(s.sc, 0) AS BIGINT) AS score
      |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    TextOps.keywordScore(Tables.documents(s, d),
        Seq(("slow", -2L), ("fast", 2L), ("big", 1L), ("small", -1L), ("merge", 3L)))
      .orderBy("doc_id")
  }

  private val tfidfTop = Q(
    "llm_tfidf_top",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
      |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
      |nd AS (SELECT count(*) AS nd FROM documents),
      |x AS (SELECT tf.doc_id, tf.tok,
      |        round(tf.tf * ln(CAST(nd.nd AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
      |      FROM tf JOIN df USING (tok) CROSS JOIN nd),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rk FROM x)
      |SELECT doc_id, tok, tfidf, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5
      |ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
    TextOps.tfidfTop(Tables.documents(s, d), k = 5).orderBy("doc_id", "rk")
  }

  /** Decontamination: docs with `doc_id % 50 == 0` play the held-out
    * benchmark; every remaining (training) doc reports its worst
    * single-eval-doc shingle overlap. The planted near-dup pairs make
    * several training docs genuinely contaminated. */
  private val decontaminate = Q(
    "llm_decontaminate",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(t) - 2),
      |         i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))) AS sh FROM toks),
      |tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % 50 <> 0),
      |ev AS (SELECT doc_id AS eval_id, sh FROM sh WHERE doc_id % 50 = 0),
      |ov AS (SELECT tr.doc_id, ev.eval_id, count(*) AS c
      |       FROM tr JOIN ev USING (sh) GROUP BY 1, 2),
      |mx AS (SELECT doc_id, max(c) AS max_shared FROM ov GROUP BY 1)
      |SELECT d.doc_id AS doc_id, coalesce(mx.max_shared, 0) AS max_shared,
      |       coalesce(mx.max_shared, 0) >= 5 AS contaminated
      |FROM documents d LEFT JOIN mx USING (doc_id)
      |WHERE d.doc_id % 50 <> 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    TextOps.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), minShared = 5)
      .orderBy("doc_id")
  }

  /** The contamination FIREWALL on the REAL streaming path
    * ([[TextOps.decontaminateStream]]): the held-out benchmark's
    * shingle index broadcasts once, and the training corpus replayed
    * through 5 micro-batches gets its per-document contamination
    * verdict at ingest — stateless, so the replay hash-matches the
    * batch [[decontaminate]] key's own oracle. The production shape:
    * quarantine contaminated documents BEFORE they land in the
    * corpus instead of auditing afterwards. */
  private val streamDecontaminateReplay = Q(
    "stream_decontaminate_replay", decontaminate.oracle.get) { (s, d) =>
    val evalDocs = Tables.documents(s, d).filter(col("doc_id") % 50 === 0)
    graft.streaming.BoundedReplay.replayDocuments(s, d)(docs =>
      TextOps.decontaminateStream(
        docs.filter(col("doc_id") % 50 =!= 0), evalDocs, minShared = 5))
      .orderBy("doc_id")
  }

  private val lmScore = Q(
    "llm_lm_score",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |big AS (SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
      |        FROM toks, unnest(range(len(t) - 1)) AS u(i) WHERE len(t) >= 2),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok) AS v FROM
      |        (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
      |lp AS (SELECT b.doc_id,
      |         round(ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)), 6) AS lp
      |       FROM big b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(round(sum(CAST(lp AS DECIMAL(18,6))) / count(*), 4) AS DOUBLE) AS lm_score
      |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextOps.lmScore(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** Held-out LM scoring: counts trained on `doc_id % 5 <> 0`, scores
    * for the held-out 20% — no self-inflation (see
    * [[TextOps.lmScoreHeldOut]]). */
  private val lmHeldout = Q(
    "llm_lm_heldout",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |big AS (SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
      |        FROM toks, unnest(range(len(t) - 1)) AS u(i) WHERE len(t) >= 2),
      |trb AS (SELECT * FROM big WHERE doc_id % 5 <> 0),
      |teb AS (SELECT * FROM big WHERE doc_id % 5 = 0),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM trb GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM trb GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok) AS v FROM
      |        (SELECT unnest(string_split(text, ' ')) AS tok
      |         FROM documents WHERE doc_id % 5 <> 0)),
      |lp AS (SELECT b.doc_id,
      |         round(ln(CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE)
      |                  / CAST(coalesce(c1.c1, 0) + v.v AS DOUBLE)), 6) AS lp
      |       FROM teb b LEFT JOIN c2 USING (w1, w2)
      |                  LEFT JOIN c1 USING (w1) CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(round(sum(CAST(lp AS DECIMAL(18,6))) / count(*), 4) AS DOUBLE) AS lm_score
      |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    TextOps.lmScoreHeldOut(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0))
      .orderBy("doc_id")
  }

  /** Character-entropy quality signal; see [[TextOps.charEntropy]] for
    * the micro-nat encoding. Empty-string filter keeps Spark's
    * `split(text, '')` (Java split, trailing "") and DuckDB's
    * `string_split(text, '')` (no trailing element) aligned. */
  private val charEntropy = Q(
    "llm_char_entropy",
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      |cc AS (SELECT doc_id, ch, count(*) AS nc FROM ch WHERE ch <> '' GROUP BY 1, 2),
      |ag AS (SELECT doc_id, CAST(sum(nc) AS BIGINT) AS n, count(*) AS n_distinct_chars,
      |         sum(CAST(round(nc * ln(CAST(nc AS DOUBLE)), 8) AS DECIMAL(28,8))) AS t
      |       FROM cc GROUP BY 1)
      |SELECT doc_id, n, n_distinct_chars,
      |  CAST(floor(1000000 * (ln(CAST(n AS DOUBLE)) - CAST(t AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT) AS entropy_u
      |FROM ag ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextOps.charEntropy(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** PII scrub: mask every digit of the identifying column (`c_name`
    * carries the numeric customer id in this fixture), count what was
    * masked. */
  private val piiRedact = Q(
    "llm_pii_redact",
    """SELECT c_custkey, regexp_replace(c_name, '[0-9]', '#', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT) AS n_hits
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    TextOps.redact(Tables.customer(s, d), "c_custkey", "c_name", "[0-9]", "#")
      .orderBy("c_custkey")
  }

  /** Gopher-style repetition/shape rules; the fixture's planted
    * near-dup docs have elevated duplicate-bigram fractions, so both
    * verdicts occur. */
  private val repFilter = Q(
    "llm_rep_filter",
    """WITH b AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      |m AS (SELECT doc_id, CAST(len(t) AS INT) AS n_tok,
      |        CASE WHEN len(t) < 2 THEN 0
      |             ELSE CAST(floor(1000000 * (1.0 -
      |               CAST(len(list_distinct(list_transform(range(len(t) - 1),
      |                 i -> t[i+1] || ' ' || t[i+2]))) AS DOUBLE)
      |               / CAST(len(t) - 1 AS DOUBLE))) AS BIGINT) END AS dup_bigram_u,
      |        CAST(floor(1000000 *
      |          CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
      |          / CAST(length(text) AS DOUBLE)) AS BIGINT) AS symbol_u
      |      FROM b)
      |SELECT doc_id, n_tok, dup_bigram_u, symbol_u,
      |  (dup_bigram_u <= 200000 AND symbol_u <= 100000
      |   AND n_tok BETWEEN 5 AND 100000) AS keep
      |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextOps.repetitionFilter(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** Per-source corpus report — the rollup a pipeline publishes after a
    * hygiene pass: volume, token mass, mean doc length, and the share
    * of docs the repetition rules keep, per source stratum. Composes
    * [[TextOps.repetitionFilter]] with a grouped aggregate; one extra
    * shuffle on the (tiny) stratum key. */
  private val corpusReport = Q(
    "llm_corpus_report",
    """WITH b AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |m AS (SELECT doc_id, source, CAST(len(t) AS INT) AS n_tok,
      |        CASE WHEN len(t) < 2 THEN 0
      |             ELSE CAST(floor(1000000 * (1.0 -
      |               CAST(len(list_distinct(list_transform(range(len(t) - 1),
      |                 i -> t[i+1] || ' ' || t[i+2]))) AS DOUBLE)
      |               / CAST(len(t) - 1 AS DOUBLE))) AS BIGINT) END AS dup_u
      |      FROM b)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tok,
      |  CAST(floor(1000000 * CAST(sum(n_tok) AS DOUBLE) / count(*)) AS BIGINT) AS mean_tok_u,
      |  CAST(sum(CASE WHEN dup_u <= 200000 AND n_tok BETWEEN 5 AND 100000
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
      |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val metrics = TextOps.repetitionFilter(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    metrics.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("total_tok"),
        floor(lit(1000000) * sum(col("n_tok").cast("long")).cast("double")
          / count(lit(1))).cast("long").as("mean_tok_u"),
        sum(when(col("dup_bigram_u") <= 200000 &&
          col("n_tok").between(5, 100000), 1L).otherwise(0L)).as("n_keep"))
      .orderBy("source")
  }

  /** SpaceSaving heavy hitters over the token stream. Capacity 64
    * exceeds this corpus's 31-token vocabulary, so the sketch runs in
    * its provably-exact regime (err = 0) and the DuckDB oracle can
    * hash-check it; `SketchAccuracySpec` exercises the approximate
    * regime (capacity < distinct) on skewed data. */
  private val heavyHitters = Q(
    "llm_topk_heavy",
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1)
      |SELECT term, cnt, CAST(0 AS BIGINT) AS err FROM c
      |ORDER BY cnt DESC, term LIMIT 5""".stripMargin) { (s, d) =>
    val ss = org.apache.spark.sql.functions.udaf(
      new graft.functions.SketchAggregators.SpaceSavingTopK(64),
      org.apache.spark.sql.Encoders.STRING)
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .agg(ss(col("term")).as("tops"))
      .select(explode(col("tops")).as("x"))
      .select(col("x._1").as("term"), col("x._2").as("cnt"), col("x._3").as("err"))
      .orderBy(col("cnt").desc, col("term")).limit(5)
  }

  /** The trained merge list for [[bpeApply]] — rank-ordered pairs as a
    * real BPE trainer would emit for this vocabulary. Shared verbatim
    * by the Spark op and the generated oracle replace chain. */
  private val bpeMerges: Seq[(String, String)] = Seq(
    "e r" -> "er", "o r" -> "or", "t h" -> "th", "th e" -> "the",
    "a t" -> "at", "s t" -> "st", "a n" -> "an", "i n" -> "in",
    "r o" -> "ro", "or d" -> "ord", "ord er" -> "order", "k e y" -> "key")

  /** BPE tokenizer application ([[TextOps.bpeApply]]): per-doc token
    * and subword-unit totals under the fixed trained merge list. */
  private val bpeApply = Q(
    "llm_bpe_apply", {
      val chain = bpeMerges.foldLeft("array_to_string(string_split(w, ''), ' ')") {
        case (acc, (from, to)) => s"replace($acc, '$from', '$to')"
      }
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |s AS (SELECT doc_id, len(string_split($chain, ' ')) AS units FROM t)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(units) AS BIGINT) AS n_units
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    TextOps.bpeApply(Tables.documents(s, d), bpeMerges)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("units").as("n_units"))
      .orderBy("doc_id")
  }

  /** Boilerplate n-gram detection ([[TextOps.hotNgrams]]): 5-grams
    * shared by ≥3 documents with their document frequency — the
    * duplicated-span table C4-style cleaners strip against. The oracle
    * rebuilds the same distinct-per-doc gram set with DuckDB list
    * slicing. */
  private val boilerplateNgrams = Q(
    "llm_boilerplate_ngrams",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
      |          FROM toks, UNNEST(generate_series(1, len(t)-4)) AS u(i)
      |          WHERE len(t) >= 5)
      |SELECT g, CAST(count(*) AS BIGINT) AS n_docs FROM grams GROUP BY g
      |HAVING count(*) >= 3 ORDER BY g""".stripMargin) { (s, d) =>
    TextOps.hotNgrams(Tables.documents(s, d), n = 5, minDocs = 3)
      .orderBy("g")
  }

  /** Per-doc boilerplate fraction ([[TextOps.boilerplateRatio]]): the
    * row-level signal derived from the hot-gram table — what fraction
    * of each doc's distinct 5-grams are shared by ≥3 docs. */
  private val boilerplateRatio = Q(
    "llm_boilerplate_ratio",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
      |          FROM toks, UNNEST(generate_series(1, len(t)-4)) AS u(i)
      |          WHERE len(t) >= 5),
      |hot AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 3)
      |SELECT grams.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN hot.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
      |  round(CAST(sum(CASE WHEN hot.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |        / count(*), 6) AS hot_ratio
      |FROM grams LEFT JOIN hot ON grams.g = hot.g
      |GROUP BY grams.doc_id ORDER BY grams.doc_id""".stripMargin) { (s, d) =>
    TextOps.boilerplateRatio(Tables.documents(s, d), n = 5, minDocs = 3)
      .orderBy("doc_id")
  }

  /** One BPE training round as oracle CTEs over vocab table `v{k}`
    * (`w` = the raw word as the window key, `cnt`, `syms` list):
    * weighted adjacent-pair counts → the `(support DESC, l, r)` argmax
    * → the leftmost-first non-overlapping rewrite. The rewrite's fold
    * ("merge unless the previous position already merged") is
    * expressed closed-form: a position merges iff it matches (l, r) in
    * the ORIGINAL array and an even number of consecutive matches
    * immediately precede it (a merged pair's new symbol `l||r` can
    * never equal `l`, so a merge only ever blocks its immediate
    * successor — the gaps-and-islands parity argument `BpeTrainSpec`'s
    * reference implementation also relies on). `MATERIALIZED` pins
    * each round to evaluate once — the chain is otherwise inlined
    * exponentially. */
  private def bpeOracleRound(k: Int): String =
    s"""p$k AS MATERIALIZED (SELECT l, r, sum(cnt) AS support FROM (
       |  SELECT v.cnt, v.syms[t.i] AS l, v.syms[t.i+1] AS r
       |  FROM v$k v, unnest(range(1, len(v.syms))) AS t(i)) GROUP BY 1, 2),
       |b$k AS MATERIALIZED (SELECT l, r, support FROM p$k WHERE support >= 2
       |  ORDER BY support DESC, l, r LIMIT 1),
       |e$k AS MATERIALIZED (SELECT v.w, v.cnt, t.i, v.syms[t.i] AS s,
       |    CASE WHEN t.i < len(v.syms) AND v.syms[t.i] = b.l
       |      AND v.syms[t.i+1] = b.r THEN 1 ELSE 0 END AS mt
       |  FROM v$k v CROSS JOIN b$k b,
       |       unnest(range(1, len(v.syms)+1)) AS t(i)),
       |g$k AS (SELECT *, CASE WHEN mt = 1 THEN
       |    i - row_number() OVER (PARTITION BY w, mt ORDER BY i) END AS isl
       |  FROM e$k),
       |h$k AS (SELECT *, CASE WHEN mt = 1 THEN
       |    min(i) OVER (PARTITION BY w, isl) END AS rs FROM g$k),
       |f$k AS (SELECT w, cnt, i, s,
       |    CASE WHEN mt = 1 AND (i - rs) % 2 = 0 THEN 2
       |         WHEN lag(CASE WHEN mt = 1 AND (i - rs) % 2 = 0 THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY w ORDER BY i) = 1 THEN 0
       |         ELSE 1 END AS kind
       |  FROM h$k),
       |v${k + 1} AS MATERIALIZED (SELECT w, cnt,
       |    list(CASE WHEN kind = 2 THEN (SELECT l || r FROM b$k) ELSE s END
       |         ORDER BY i) AS syms
       |  FROM f$k WHERE kind != 0 GROUP BY 1, 2)""".stripMargin

  /** The full chained-CTE BPE oracle: the distinct-word vocab, then
    * `n` unrolled training rounds (the [[graft.queries
    * .SimilarityQueries]] det-ANN pattern — the oracle replays the
    * whole iterative computation, it does not trust the engine), then
    * the merge table off the per-round argmax rows. A round whose best
    * support falls under `minSupport=2` yields an empty `b{k}`, which
    * empties every later round — exactly the trainer's early stop. */
  private def bpeOracleSql(n: Int): String =
    s"""WITH w0 AS (SELECT w, count(*) AS cnt FROM (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY 1),
       |v1 AS MATERIALIZED (SELECT w, cnt,
       |  list_append(list_transform(range(1, length(w)+1),
       |    i -> substr(w, CAST(i AS INT), 1)), '</w>') AS syms FROM w0),
       |""".stripMargin +
      (1 to n).map(bpeOracleRound).mkString(",\n") +
      "\nSELECT * FROM (" +
      (1 to n).map(k =>
        s"""SELECT $k AS rank, l AS "left", r AS "right", l || r AS merged,
           |CAST(support AS BIGINT) AS support FROM b$k""".stripMargin)
        .mkString(" UNION ALL ") +
      ") ORDER BY rank"

  /** BPE TRAINING on the corpus ([[TextOps.bpeTrain]]): the learned
    * merge table — now under the FULL hash oracle: the DuckDB side
    * unrolls all 8 training rounds as chained materialized CTEs
    * ([[bpeOracleSql]]), rebuilding pair counts, the deterministic
    * `(support DESC, left, right)` argmax and the leftmost-first
    * non-overlapping rewrite each round, so the whole iterative
    * training loop is cross-engine verified (the last deterministic
    * rows-only key of the library). `BpeTrainSpec` additionally pins
    * the trainer to an independent in-memory reference. */
  private val bpeTrain = Q("llm_bpe_train", bpeOracleSql(8)) { (s, d) =>
    TextOps.bpeTrain(Tables.documents(s, d), nMerges = 8).orderBy("rank")
  }

  val all: Seq[Q] = Seq(wordcount, tokenCount, fingerprint, langId, quality,
    keywordScore, tfidfTop, decontaminate, streamDecontaminateReplay,
    lmScore, lmHeldout, charEntropy,
    piiRedact, repFilter, corpusReport, heavyHitters, bpeApply,
    boilerplateNgrams, boilerplateRatio, bpeTrain)
}
