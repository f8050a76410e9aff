package graft.operators

import graft.functions.Hashes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized text-analysis operators — the library surface behind
  * the fixture-bound `llm_*` text keys. Inputs: integral id column +
  * whitespace-tokenized text column.
  * @note scale: every op is explode → one hash-shuffle on a token/doc
  *   key → partial+final agg; no cross joins, no driver collection.
  */
object TextOps {

  import Norm.normalized

  /** Corpus-wide token counts: `(tok, n)`. */
  def wordcount(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))

  /** Per-doc token statistics: whitespace tokens, alpha-run (BPE-ish)
    * tokens, char length: `(doc_id, n_ws, n_alpha, n_chars_calc)`. */
  def tokenCounts(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    normalized(df, idCol, textCol).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_ws"),
      regexp_count(col("text"), lit("[a-z]+")).cast("int").as("n_alpha"),
      length(col("text")).as("n_chars_calc"))

  /** Corpus boilerplate detection (the C4/CCNet "duplicated span"
    * analysis): every n-gram appearing in at least `minDocs` DISTINCT
    * documents, with its document frequency — `(g, n_docs)`. Downstream
    * cleaners anti-join docs' spans against this table to strip shared
    * headers/footers/license blocks, and decontamination treats high-df
    * grams as carrying no signal.
    *
    * @note scale: explode to distinct per-doc grams (corpus tokens × n
    *   rows, but map-side — no join), ONE shuffle on the gram for the
    *   doc-frequency agg with partial aggregation upstream, and the
    *   `minDocs` filter drops the long unique tail before any sink. For
    *   100 TB corpora, group on [[graft.functions.Hashes.polyHash]] of
    *   the gram instead to shuffle 8-byte keys (collision odds
    *   |grams|²/2^57), keeping one gram string per group via `min`. */
  def hotNgrams(df: DataFrame, n: Int = 5, minDocs: Long = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    DedupOps.shingles(df, idCol, textCol, n)
      .groupBy(col("sh").as("g"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Per-document boilerplate fraction against [[hotNgrams]]: how much
    * of each doc's distinct n-gram set is corpus-shared —
    * `(doc_id, n_grams, n_hot, hot_ratio)`. The row-level quality
    * signal cleaners threshold on (a doc that is mostly shared spans is
    * a template, not content). Docs shorter than `n` tokens have no
    * grams and drop out, mirroring the gram build.
    *
    * @note scale: reuses the one gram explode for both sides; the hot
    *   table is df-filtered (tiny — boilerplate is by definition rare
    *   distinct mass) so the back-join broadcasts. Two shuffles total:
    *   gram df-agg, per-doc agg. */
  def boilerplateRatio(df: DataFrame, n: Int = 5, minDocs: Long = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = DedupOps.shingles(df, idCol, textCol, n)
    val hot = hotNgrams(df, n, minDocs, idCol, textCol)
      .select(col("g").as("sh"), lit(1).as("is_hot"))
    grams.join(broadcast(hot), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("is_hot"), lit(0))).cast("long").as("n_hot"))
      .withColumn("hot_ratio",
        round(col("n_hot").cast("double") / col("n_grams"), 6))
  }

  /** Whole-document rolling-hash fingerprint: `(doc_id, fp)`. */
  def fingerprint(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    normalized(df, idCol, textCol)
      .select(col("doc_id"), Hashes.polyHash(col("text")).as("fp"))

  /** Stopword-ratio language heuristic: `(doc_id, en_ratio, pred)`. */
  def langId(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      stopwords: Seq[String] = Seq("a", "the"), threshold: Double = 0.1,
      lang: String = "en"): DataFrame = {
    val toks = split(col("text"), " ")
    val ratio = size(filter(toks, t => stopwords.map(s => t === s).reduce(_ || _)))
      .cast("double") / size(toks).cast("double")
    normalized(df, idCol, textCol).select(
      col("doc_id"),
      round(ratio, 6).as("en_ratio"),
      when(ratio >= threshold, lang).otherwise("unk").as("pred"))
  }

  /** Composite quality in tie-proof micro-units:
    * `(doc_id, n_tok, ttr_u, score_u)` — see the key's scaladoc for why
    * floor(1e6·x) instead of round(x, 6). */
  def quality(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = split(col("text"), " ")
    val n = size(toks).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / n
    val meanLen = length(expr("replace(text, ' ', '')")).cast("double") / n
    normalized(df, idCol, textCol).select(
      col("doc_id"),
      size(toks).as("n_tok"),
      floor(lit(1000000) * ttr).cast("long").as("ttr_u"),
      floor(lit(1000000) * (lit(0.5) * ttr + lit(0.3) * least(n / 100.0, lit(1.0))
        + lit(0.2) * least(meanLen / 10.0, lit(1.0)))).cast("long").as("score_u"))
  }

  /** Weighted-lexicon scoring (broadcast join on exploded tokens):
    * `(doc_id, score)`; docs with no lexicon hits score 0. */
  def keywordScore(df: DataFrame, lexicon: Seq[(String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val docs = normalized(df, idCol, textCol)
    val lex = lexicon.toDF("tok", "w")
    val scores = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .join(broadcast(lex), "tok")
      .groupBy("doc_id").agg(sum(col("w")).as("sc"))
    docs.join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("sc"), lit(0L)).as("score"))
  }

  /** Train/eval decontamination — the pre-training hygiene step that
    * drops training documents overlapping a held-out benchmark. For
    * every training doc: the maximum number of shingles it shares with
    * any single eval doc, and a contaminated flag at `minShared`.
    * Returns `(doc_id, max_shared, contaminated)` for ALL training docs
    * (no-overlap docs report 0 / false).
    *
    * @note scale: the only join is on the shingle hash — eval-side
    *   shingles are benchmark-sized (thousands of docs), so the join is
    *   a broadcast against an arbitrarily large training corpus; cap
    *   ubiquitous shingles (df > threshold) if a benchmark contains
    *   boilerplate. */
  def decontaminate(train: DataFrame, eval: DataFrame, minShared: Int = 5,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3): DataFrame = {
    val ts = DedupOps.hashedShingles(train, idCol, textCol, n)
      .select(col("doc_id"), col("h"))
    val es = DedupOps.hashedShingles(eval, idCol, textCol, n)
      .select(col("doc_id").as("eval_id"), col("h"))
    val worst = ts.join(broadcast(es), "h")
      .groupBy("doc_id", "eval_id").agg(count(lit(1)).as("shared"))
      .groupBy("doc_id").agg(max("shared").as("max_shared"))
    normalized(train, idCol, textCol).select(col("doc_id"))
      .join(worst, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("max_shared"), lit(0L)).as("max_shared"),
        (coalesce(col("max_shared"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** STREAMING decontamination — the ingest-time contamination
    * FIREWALL: the held-out benchmark suite's shingle index is
    * metadata-sized next to a training corpus (exactly the asymmetry
    * [[decontaminate]]'s broadcast join exploits), so it broadcasts
    * once and every arriving training document scores its worst
    * single-eval-doc overlap per row — stateless, no shuffle, the
    * same `(doc_id, max_shared, contaminated)` verdict the batch form
    * produces, emitted the moment the document arrives. A complete
    * replay equals [[decontaminate]] exactly
    * (`stream_decontaminate_replay` gates it under the same oracle);
    * in production this runs as a filter stage of the ingest stream,
    * quarantining contaminated documents before they ever land in the
    * corpus rather than auditing after the fact.
    *
    * Shingle hashing replicates the shared 57-bit polynomial hash
    * (`poly_hash`) in the closure, so flags agree with the batch
    * join's bit for bit.
    *
    * @note scale: per document the cost is its own shingle count ×
    *   one hash-map probe; the broadcast is the eval suite's (hash →
    *   eval ids) postings, capped loudly — benchmark suites are
    *   thousands of documents against a 100 TB corpus. Refresh the
    *   broadcast per epoch exactly like the dedup snapshots. */
  def decontaminateStream(train: DataFrame, evalDocs: DataFrame,
      minShared: Int = 5, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3,
      maxEvalPostings: Long = 50000000L): DataFrame = {
    val sp = train.sparkSession
    import sp.implicits._
    val bc = contaminationIndex(sp, evalDocs, idCol, textCol, n, maxEvalPostings)
    val nn = n
    val minS = minShared
    normalized(train, idCol, textCol)
      .as[(Long, String)]
      .map { case (id, text) =>
        val mx = worstOverlap(bc.value, text, nn)
        (id, mx, mx >= minS)
      }
      .toDF("doc_id", "max_shared", "contaminated")
  }

  /** Broadcast the benchmark suite's `(shingle hash → eval ids)`
    * postings — the firewall's shared index, loudly capped (benchmark
    * suites are metadata next to a training corpus). */
  private[graft] def contaminationIndex(sp: org.apache.spark.sql.SparkSession,
      evalDocs: DataFrame, idCol: String, textCol: String, n: Int,
      maxEvalPostings: Long)
      : org.apache.spark.broadcast.Broadcast[Map[Long, Array[Long]]] = {
    import sp.implicits._
    val evRows = DedupOps.hashedShingles(evalDocs, idCol, textCol, n)
      .select(col("h"), col("doc_id")).distinct()
    val cnt = evRows.count()
    require(cnt <= maxEvalPostings,
      s"eval index has $cnt (hash, doc) postings (> $maxEvalPostings) — " +
        "the benchmark suite must stay broadcast-sized; shard the eval " +
        "set across firewall passes or raise maxEvalPostings deliberately")
    val idx: Map[Long, Array[Long]] = evRows.as[(Long, Long)].collect()
      .groupBy(_._1).map { case (h, rows) => h -> rows.map(_._2) }
    sp.sparkContext.broadcast(idx)
  }

  /** Per-document worst single-eval-doc shingle overlap against a
    * [[contaminationIndex]] — `poly_hash` replicated in the closure so
    * verdicts match the batch join bit for bit. */
  private[graft] def worstOverlap(idx: Map[Long, Array[Long]],
      text: String, n: Int): Long = {
    val prime = graft.functions.Hashes.P
    // split(" ", -1): Spark's split keeps trailing empty tokens
    val toks = text.split(" ", -1)
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val per = scala.collection.mutable.HashMap.empty[Long, Long]
    if (toks.length >= n) {
      var i = 0
      while (i + n <= toks.length) {
        val s = toks.slice(i, i + n).mkString(" ")
        var h = 0L
        var j = 0
        while (j < s.length) { h = (31L * h + s.charAt(j)) % prime; j += 1 }
        if (seen.add(h))
          idx.get(h).foreach(_.foreach(e =>
            per.update(e, per.getOrElse(e, 0L) + 1L)))
        i += 1
      }
    }
    if (per.isEmpty) 0L else per.values.max
  }

  /** Bigram language-model quality score with add-one smoothing: each
    * doc's mean log-probability of its bigrams under the corpus LM,
    * `(doc_id, n_bigrams, lm_score)` — the perplexity-style signal used
    * to filter incoherent text. Per-bigram log-probs are rounded to 6
    * decimals and summed as decimals, so the per-doc mean is
    * order-independent (float addition isn't associative; decimal is).
    *
    * @note scale: counts are two hash aggs; the conditional-count and
    *   vocabulary tables are vocabulary-sized — broadcast here; for a
    *   web-scale vocabulary switch the c2 join to shuffle-hash and keep
    *   everything else. */
  /** Per-doc `(doc_id, w1, w2)` consecutive-token bigrams of a
    * `(doc_id, text)` frame — shared by the LM scorers and the token
    * co-occurrence graph. */
  def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))

  def lmScore(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val docs = normalized(df, idCol, textCol)
    val big = bigrams(docs)
      .persist() // feeds both count tables and the scoring join
    val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = big.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = docs.select(explode(split(col("text"), " ")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    big.join(broadcast(c2), Seq("w1", "w2")).join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("lp", round(log((col("c2") + 1).cast("double") /
        (col("c1") + col("v")).cast("double")), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          / count(lit(1)), 4).cast("double").as("lm_score"))
  }

  /** Held-out bigram LM scoring — the honest variant of [[lmScore]]:
    * the LM's counts come from `train` only, and only `test` docs are
    * scored, so a test doc's own text never inflates its score (the
    * same leakage real perplexity filters avoid by scoring with a model
    * trained elsewhere). Unseen bigrams fall back to add-one smoothing
    * over the train vocabulary: `ln((c2+1)/(c1+V))` with missing counts
    * as 0. Returns `(doc_id, n_bigrams, lm_score)` for test docs.
    *
    * @note scale: identical shape to [[lmScore]] — the count tables are
    *   train-vocabulary-sized and broadcast; the scored side streams.
    *   Train 100 TB, score any number of shards independently. */
  def lmScoreHeldOut(train: DataFrame, test: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val trDocs = normalized(train, idCol, textCol)
    val trBig = bigrams(trDocs)
      .persist() // feeds both count tables
    val c2 = trBig.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = trBig.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = trDocs.select(explode(split(col("text"), " ")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    bigrams(normalized(test, idCol, textCol))
      .join(broadcast(c2), Seq("w1", "w2"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("lp", round(log(
        (coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          / count(lit(1)), 4).cast("double").as("lm_score"))
  }

  /** Character-distribution entropy — a language-agnostic quality
    * signal (binary junk and repeated-char spam score near 0; natural
    * text sits around 4-4.5 bits ≈ 2.8-3.1 nats). Emits
    * `(doc_id, n, n_distinct_chars, entropy_u)` with entropy in
    * tie-proof micro-nats: `floor(1e6·(ln n − Σ nc·ln nc / n))`.
    * Per-char terms are rounded once and summed as decimals so the
    * result is independent of partitioning (float addition isn't
    * associative; decimal is).
    *
    * @note scale: explode-by-char multiplies row count by ~doc length —
    *   at 100 TB do the char histogram inside one codegen'd
    *   `aggregate()` HOF per row instead; this explode form is the
    *   oracle-matchable twin with the same output contract. */
  def charEntropy(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val docs = normalized(df, idCol, textCol)
    val cc = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "") // Java split(-1) keeps a trailing ""
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("nc"))
    cc.groupBy("doc_id")
      .agg(sum("nc").as("n"), count(lit(1)).as("n_distinct_chars"),
        sum(round(col("nc").cast("double") * log(col("nc").cast("double")), 8)
          .cast(org.apache.spark.sql.types.DecimalType(28, 8))).as("t"))
      .select(col("doc_id"), col("n"), col("n_distinct_chars"),
        floor(lit(1000000) * (log(col("n").cast("double"))
          - col("t").cast("double") / col("n").cast("double")))
          .cast("long").as("entropy_u"))
  }

  /** Repetition / shape rules (Gopher-style corpus hygiene): duplicate
    * bigram fraction, non-text symbol ratio, and token-count bounds,
    * folded into one `keep` verdict. Emits
    * `(doc_id, n_tok, dup_bigram_u, symbol_u, keep)` with ratios in
    * tie-proof micro-units (`floor(1e6·x)`).
    *
    * Unlike the explode-based stats, everything here is per-row
    * higher-order-function arithmetic — no shuffle at all, one
    * codegen'd projection, so the filter runs at scan speed on any
    * corpus size.
    */
  def repetitionFilter(df: DataFrame, maxDupBigramU: Long = 200000L,
      maxSymbolU: Long = 100000L, minTok: Int = 5, maxTok: Int = 100000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val docs = normalized(df, idCol, textCol)
    // Bind the token array ONCE: referencing split(text) inside the
    // transform lambda would re-split the whole doc per element
    // (measured 8x slower — O(len²) per doc).
    val dupU = when(size(col("t")) < 2, lit(0L)).otherwise(
      floor(lit(1000000) * (lit(1.0) -
        size(array_distinct(expr(
          "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))")))
          .cast("double") / (size(col("t")) - 1).cast("double")))
        .cast("long"))
    val symU = floor(lit(1000000) *
      length(regexp_replace(col("text"), "[a-z ]", "")).cast("double") /
      length(col("text")).cast("double")).cast("long")
    docs.withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), size(col("t")).as("n_tok"),
        dupU.as("dup_bigram_u"), symU.as("symbol_u"))
      .withColumn("keep",
        col("dup_bigram_u") <= maxDupBigramU &&
          col("symbol_u") <= maxSymbolU &&
          col("n_tok").between(minTok, maxTok))
  }

  /** Pattern redaction — the PII-scrub pass (mask phone digits, emails,
    * ids) a corpus runs before training. Pure per-row projection:
    * `(id, redacted, n_hits)`; codegen'd, no shuffle, any scale. */
  def redact(df: DataFrame, idCol: String, textCol: String,
      pattern: String, replacement: String): DataFrame =
    df.select(col(idCol),
      regexp_replace(col(textCol), pattern, replacement).as("redacted"),
      regexp_count(col(textCol), lit(pattern)).cast("int").as("n_hits"))

  /** Apply a TRAINED byte-pair-encoding merge list to every token —
    * the real production tokenizer pattern: merges are learned offline
    * on a sample (driver/offline job), then applied at corpus scale as
    * pure per-row string work. Each token is exploded to a
    * space-separated symbol sequence and the merges are applied in
    * rank order as plain (non-regex) replaces — the exact BPE apply
    * semantics, deterministic in any engine.
    *
    * Returns `(idCol, tok, units)` — one row per token with its final
    * subword count.
    *
    * @note scale: zero shuffle — explode + a fixed chain of codegen'd
    *   string replaces. A 100× corpus scales linearly; the merge table
    *   is compile-time constant (for 30k+ merges, switch to a
    *   mapPartitions trie tokenizer — same narrow shape). */
  def bpeApply(df: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val docs = normalized(df, idCol, textCol)
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val sym0 = array_join(filter(split(col("tok"), ""), c => c =!= ""), " ")
    val symFinal = merges.foldLeft(sym0) { case (c, (from, to)) =>
      // non-regex replace; merge pair symbols are trusted literals
      call_function("replace", c, lit(from), lit(to))
    }
    toks.select(col("doc_id"), col("tok"),
      size(split(symFinal, " ")).cast("int").as("units"))
  }

  /** TRAIN a byte-pair-encoding merge list on the corpus — the other
    * half of the tokenizer story next to [[bpeApply]]: the classic BPE
    * loop (Sennrich et al. 2016, public algorithm) run with Spark doing
    * the heavy pass. The corpus collapses ONCE to the distinct-word
    * frequency table (the standard compression: pair statistics only
    * depend on it), then each of `nMerges` rounds computes
    * weighted adjacent-pair counts over that table, picks the argmax
    * (ties broken by (support DESC, left ASC, right ASC) — a total
    * order, so training is deterministic on any partitioning), and
    * rewrites the symbol sequences with a leftmost-first non-overlapping
    * fold. Words carry a `</w>` end marker, the original algorithm's
    * word-boundary contract.
    *
    * Returns the merge table `(rank, left, right, merged, support)` —
    * vocabulary metadata, `nMerges` rows.
    *
    * Per round, ONE row (the argmax) reaches the driver — the same
    * bounded-collect pattern as IVF centroid training. The pair count
    * and the rewrite are distributed; the rewrite is an `aggregate` HOF
    * (exact array semantics — no string-replace boundary hazards).
    *
    * @note scale: the driver loop is `nMerges` small jobs over the
    *   distinct-word table (web-scale: ~10⁸ rows — a narrow cached
    *   frame), NOT over the corpus; the corpus is touched once by the
    *   word count. State per round is one cached vocab snapshot
    *   (previous snapshot unpersisted). A 30k-merge production run
    *   batches rounds per job; the per-round machinery is identical. */
  def bpeTrain(df: DataFrame, nMerges: Int = 8, minSupport: Long = 2L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = normalized(df, idCol, textCol)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), concat(
        filter(split(col("w"), ""), c => c =!= ""),
        array(lit("</w>"))).as("syms"))
    var cur = words.persist()
    cur.count() // materialize before the loop
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var done = false
    var rank = 1
    while (rank <= nMerges && !done) {
      val best = cur
        .select(col("cnt"), explode(expr(
          "zip_with(slice(syms, 1, size(syms)-1), slice(syms, 2, size(syms)-1), " +
            "(a, b) -> struct(a AS l, b AS r))")).as("p"))
        .select(col("p.l").as("l"), col("p.r").as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("support"))
        .orderBy(col("support").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getAs[Long]("support") < minSupport) done = true
      else {
        val (l, r) = (best(0).getAs[String]("l"), best(0).getAs[String]("r"))
        val support = best(0).getAs[Long]("support")
        val m = l + r
        merges += ((rank, l, r, m, support))
        val prev = cur
        val rewritten = prev.select(col("cnt"),
          aggregate(col("syms"),
            array().cast("array<string>"),
            (acc, x) => when(size(acc) > 0 &&
                element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
              .otherwise(concat(acc, array(x)))).as("syms"))
        cur = rewritten.persist()
        cur.count()
        prev.unpersist()
        rank += 1
      }
    }
    cur.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "merged", "support")
  }

  /** Encode tokens with a trained BPE merge list using EXACT array
    * semantics — the companion to [[bpeTrain]]: each token becomes its
    * character sequence (+`</w>`), then every merge applies in rank
    * order as the same leftmost-first non-overlapping `aggregate`-HOF
    * fold the trainer uses. Unlike [[bpeApply]]'s string-replace chain
    * (fine for display-safe merge alphabets, subject to boundary
    * aliasing in general — "aa b" contains the substring "a b"), this
    * form can never merge across symbol boundaries, so
    * encode(train(corpus)) is exactly the trainer's final state.
    * Returns `(doc_id, tok, units)`.
    *
    * @note scale: zero shuffle — explode + a fixed chain of per-row
    *   array folds; linear in corpus, merge list is compile-time
    *   constant per job. */
  def bpeEncode(df: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = normalized(df, idCol, textCol)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val sym0 = concat(filter(split(col("tok"), ""), c => c =!= ""),
      array(lit("</w>")))
    val symFinal = merges.foldLeft(sym0) { case (syms, (l, r)) =>
      val m = l + r
      aggregate(syms, array().cast("array<string>"),
        (acc, x) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
          .otherwise(concat(acc, array(x))))
    }
    toks.select(col("doc_id"), col("tok"),
      size(symFinal).cast("int").as("units"))
  }

  /** Top-k tf-idf terms per doc: `(doc_id, tok, tfidf, rk)`. df(tok) is
    * derived from the tf aggregate (no second corpus pass); the
    * vocabulary-sized df table is broadcast. */
  def tfidfTop(df: DataFrame, k: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val docs = normalized(df, idCol, textCol)
    val t = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = t.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
    tf.join(broadcast(dfreq), "tok").crossJoin(nd)
      .withColumn("tfidf",
        round(col("tf") * log(col("nd").cast("double") / col("df").cast("double")), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("doc_id"), col("tok"), col("tfidf"), col("rk"))
  }

  /** CONTENT-DEFINED chunking (the storage-dedup / FastCDC idea at
    * token granularity): a chunk boundary falls after token `i`
    * whenever the rolling hash of the `window`-token context ending at
    * `i` hits `hash % modulus == 0` — so boundaries are anchored to
    * CONTENT, not positions, and an insertion near a document's head
    * shifts only the chunk it lands in, leaving every later chunk (and
    * its hash) byte-identical. That's the property position-based
    * chunking ([[PackOps.chunk]]) lacks, and what makes sub-document
    * dedup work: shared plagiarized/boilerplate spans produce EQUAL
    * `chunk_hash` values across documents regardless of where they sit.
    * Expected chunk length ≈ `modulus` tokens. Emits
    * `(doc_id, chunk_id, start_tok, end_tok, n_tok, chunk_hash)`;
    * documents shorter than `window` are dropped.
    *
    * @note scale: pure per-row HOF + native `poly_hash` arithmetic —
    *   no shuffle, no UDF; the downstream dedup is a groupBy on
    *   chunk_hash with true-duplicate-mass skew only. No min/max chunk
    *   guards here (the fixture's docs are short); production CDC adds
    *   them to bound the tail — a one-line `least/greatest` change. */
  def cdcChunks(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", window: Int = 3,
      modulus: Int = 8): DataFrame = {
    val w = window
    val m = modulus
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .withColumn("n", size(col("t")))
      .filter(col("n") >= w)
      .withColumn("bp", expr(
        s"""filter(transform(sequence($w, n), i ->
           |  IF(poly_hash(concat_ws(' ', slice(t, i - ${w - 1}, $w))) % $m = 0,
           |     i, CAST(NULL AS INT))), x -> x IS NOT NULL)""".stripMargin))
      .withColumn("starts", expr("concat(array(1), transform(bp, b -> b + 1))"))
      .withColumn("ends", expr("concat(bp, array(n))"))
      .select(col("doc_id"), col("t"),
        posexplode(arrays_zip(col("starts"), col("ends"))).as(Seq("chunk_id", "sp")))
      .filter(col("sp.starts") <= col("sp.ends"))
      .select(col("doc_id"), col("chunk_id"),
        col("sp.starts").as("start_tok"), col("sp.ends").as("end_tok"),
        (col("sp.ends") - col("sp.starts") + 1).as("n_tok"),
        expr("poly_hash(concat_ws(' ', slice(t, sp.starts, sp.ends - sp.starts + 1)))")
          .as("chunk_hash"))
  }
}
