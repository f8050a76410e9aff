package graft.queries

import graft.{Q, Tables}
import graft.functions.Hashes
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY.md §2.10
  * L4/L6 plus the training-data-pipeline set: token counting, document
  * fingerprinting, language ID, quality scoring).
  *
  * The synthetic corpus draws every language's text from one shared
  * 31-token vocabulary (verified), so the language-ID key checks the
  * *mechanism* (deterministic lexicon scoring), not labeling accuracy —
  * with real multilingual text the same pipeline carries per-language
  * lexicons.
  *
  * @note scale: every key here is explode → one hash-shuffle on a
  *   token/doc key → partial+final agg; no cross joins, no driver
  *   collection. tf-idf is two aggregations and a broadcast-able join on
  *   the term dimension.
  */
object TextQueries {

  // ------------------------------------------------------------ L4 wordcount
  private val wordcount = Q(
    "llm_wordcount",
    """SELECT tok, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok ORDER BY tok""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy("tok")
  }

  // ------------------------------------------------------------ token counting
  /** Whitespace tokens + a BPE-ish alpha-run regex count + char length. */
  private val tokenCount = Q(
    "llm_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_alpha,
      |  CAST(length(text) AS INT) AS n_chars_calc
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_ws"),
      regexp_count(col("text"), lit("[a-z]+")).cast("int").as("n_alpha"),
      length(col("text")).as("n_chars_calc"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ fingerprint
  /** Whole-document rolling-hash fingerprint ([[Hashes.polyHash]]). */
  private val fingerprint = Q(
    "llm_fingerprint",
    s"""SELECT doc_id, ${Hashes.oPolyHash("text")} AS fp
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), Hashes.polyHash(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ language ID
  /** Stopword-ratio language heuristic: share of tokens in the English
    * function-word lexicon; ≥ 0.1 → 'en'. */
  private val langId = Q(
    "llm_lang_id",
    """SELECT doc_id,
      |  round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the'))) AS DOUBLE)
      |        / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS en_ratio,
      |  CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the'))) AS DOUBLE)
      |            / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.1
      |       THEN 'en' ELSE 'unk' END AS pred
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    val ratio = size(filter(toks, t => t === "a" || t === "the")).cast("double") /
      size(toks).cast("double")
    Tables.documents(s, d).select(
      col("doc_id"),
      round(ratio, 6).as("en_ratio"),
      when(ratio >= 0.1, "en").otherwise("unk").as("pred"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ quality score
  /** Composite document quality: type-token ratio, length saturation,
    * mean token length — the standard corpus-hygiene heuristics.
    *
    * Scores are emitted as `floor(1e6·x)` micro-units, NOT `round(x,6)`:
    * every upstream op (int casts, division, multiply, add, least) is a
    * correctly-rounded IEEE op on identical operands, so the doubles are
    * bit-identical across engines — but `round`'s tie RULE differs
    * (Spark HALF_UP on the shortest decimal string vs DuckDB's binary
    * nearest), and sf0.1 hit an exact `.xxxxxx5` tie. `floor` has no
    * tie rule, so parity is unconditional. */
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
    val toks = split(col("text"), " ")
    val n = size(toks).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / n
    val meanLen = length(expr("replace(text, ' ', '')")).cast("double") / n
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).as("n_tok"),
      floor(lit(1000000) * ttr).cast("long").as("ttr_u"),
      floor(lit(1000000) * (lit(0.5) * ttr + lit(0.3) * least(n / 100.0, lit(1.0))
        + lit(0.2) * least(meanLen / 10.0, lit(1.0)))).cast("long").as("score_u"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ L6 keyword score
  /** Sentiment-style lexicon scoring: broadcast-join exploded tokens
    * against a tiny weighted lexicon, sum per document. */
  private val keywordScore = Q(
    "llm_keyword_score",
    """WITH lex(tok, w) AS (VALUES ('slow', -2), ('fast', 2), ('big', 1), ('small', -1), ('merge', 3)),
      |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |s AS (SELECT doc_id, sum(w) AS sc FROM t JOIN lex USING (tok) GROUP BY doc_id)
      |SELECT d.doc_id, CAST(coalesce(s.sc, 0) AS BIGINT) AS score
      |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val sp = s
    import sp.implicits._
    val lex = Seq(("slow", -2L), ("fast", 2L), ("big", 1L), ("small", -1L), ("merge", 3L))
      .toDF("tok", "w")
    val docs = Tables.documents(s, d)
    val scores = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .join(broadcast(lex), "tok")
      .groupBy("doc_id").agg(sum(col("w")).as("sc"))
    docs.join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("sc"), lit(0L)).as("score"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ L4 tf-idf
  /** Top-5 tf-idf terms per document (ln(N/df) idf, deterministic
    * (tfidf DESC, tok) ranking). Two aggregations + one join on the term
    * dimension — no MLlib, fully oracle-checkable. */
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
    val docs = Tables.documents(s, d)
    val t = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = t.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // df(tok) = number of docs containing tok = number of tf rows for tok
    // — derived from tf, saving a second explode + distinct over the corpus
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
    // dfreq is the term dimension (|vocabulary| rows) — broadcast it so
    // tf keeps its partitioning instead of reshuffling on tok
    tf.join(broadcast(dfreq), "tok").crossJoin(nd)
      .withColumn("tfidf",
        round(col("tf") * log(col("nd").cast("double") / col("df").cast("double")), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("doc_id"), col("tok"), col("tfidf"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  val all: Seq[Q] = Seq(wordcount, tokenCount, fingerprint, langId, quality,
    keywordScore, tfidfTop)
}
