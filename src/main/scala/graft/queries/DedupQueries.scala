package graft.queries

import graft.{Q, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Fixture-bound oracle keys for the dedup family (SURVEY.md §2.10
  * L1/L2 + the training-pipeline extras). The algorithms live in the
  * parameterized library surface [[graft.operators.DedupOps]]; each key
  * binds it to the `documents` fixture so the DuckDB oracle
  * regression-tests the library end to end.
  *
  * Shingle facts on this corpus (verified): trigram Jaccard cleanly
  * separates the 25 planted near-dup pairs (all ≥ 0.8; no background
  * pair reaches 0.3); shingle-feature SimHash at Hamming ≤ 10 selects
  * exactly the same 25 pairs (background starts at 12); MinHash-LSH
  * recall at τ = 0.8 is exact at sf0.01 and sf0.1 (verified against the
  * full pairwise oracle).
  */
object DedupQueries {

  /** DuckDB CTE fragment producing the identical shingle set. */
  private val oShingles =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(t) - 2),
      |         i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))) AS sh FROM toks)""".stripMargin

  /** Mirrors [[DedupOps.jaccardPairs]]'s shape exactly: candidate pairs
    * from shingles with document frequency ≤ 1000 (the operator's
    * default hot-shingle cap — inert on these fixtures, max df 25, but
    * restated here so the oracle contract is the CAPPED semantics at
    * any scale), then exact Jaccard over the FULL shingle sets. */
  private def oJaccardPairsCap(cap: Int) =
    s"""$oShingles,
       |cold AS (SELECT sh FROM (SELECT sh, count(*) AS dfc FROM sh GROUP BY 1) WHERE dfc <= $cap),
       |cands AS (SELECT DISTINCT a.doc_id AS ai, b.doc_id AS bi
       |          FROM sh a JOIN cold USING (sh) JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT c.ai, c.bi, count(*) AS c
       |          FROM cands c JOIN sh a ON a.doc_id = c.ai
       |          JOIN sh b ON b.doc_id = c.bi AND b.sh = a.sh GROUP BY 1, 2),
       |j AS (SELECT ai, bi, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jac
       |      FROM inter JOIN sz sa ON sa.doc_id = ai JOIN sz sb ON sb.doc_id = bi)""".stripMargin

  private val oJaccardPairs = oJaccardPairsCap(1000)

  private val dedupExact = Q(
    "llm_dedup_exact",
    """SELECT doc_id AS kept, h, CAST(cnt AS BIGINT) AS dup_count
      |FROM (SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS cnt,
      |             row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      |      FROM (SELECT doc_id, sha256(text) AS h FROM documents))
      |WHERE rn = 1 ORDER BY kept""".stripMargin) { (s, d) =>
    DedupOps.exactDedup(Tables.documents(s, d)).orderBy("kept")
  }

  private val dedupNgram = Q(
    "llm_dedup_ngram",
    s"""WITH $oJaccardPairs
       |SELECT ai, bi, jac FROM j WHERE jac >= 0.5 ORDER BY ai, bi""".stripMargin) { (s, d) =>
    DedupOps.jaccardPairs(Tables.documents(s, d))
      .filter(col("jac") >= 0.5)
      .orderBy("ai", "bi")
  }

  /** COMPLETE Jaccard-threshold join ([[DedupOps.jaccardPairsComplete]],
    * rarity-order prefix filter at t = 4/5): deterministically EVERY
    * `jac ≥ 0.8` pair — the same threshold as [[dedupFuzzy]]'s
    * MinHash-LSH route, so this key is the certified-complete twin that
    * proves LSH recall end to end, and its oracle drops the df cap
    * entirely: a brute-force all-shared-pairs restatement (the
    * [[editJoinExact]] oracle pattern). t = 4/5 — not [[dedupNgram]]'s
    * 0.5 — because the prefix fraction is `1 − 2t/(1+t)`: 11% of each
    * document's shingles at 0.8 vs 33% at 0.5, and the 10× stress probe
    * measured the 0.5 form's candidate set at 29.6M pairs on the
    * closed-vocabulary stress corpus (162 s) where the 0.8 form's
    * length filter + short prefix stay output-bounded. */
  private val dedupNgramComplete = Q(
    "llm_dedup_ngram_complete",
    s"""WITH $oShingles,
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS ai, b.doc_id AS bi, count(*) AS c
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT ai, bi,
       |  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jac
       |FROM inter JOIN sz sa ON sa.doc_id = ai JOIN sz sb ON sb.doc_id = bi
       |WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.8
       |ORDER BY ai, bi""".stripMargin) { (s, d) =>
    DedupOps.jaccardPairsComplete(Tables.documents(s, d), tNum = 4, tDen = 5)
      .orderBy("ai", "bi")
  }

  private val oSimhashSql =
    s"""WITH $oShingles,
       |th AS (SELECT doc_id, ${graft.functions.Hashes.oPolyHash("sh")} AS h FROM sh),
       |bits AS (SELECT doc_id, i, sum(CASE WHEN (h >> CAST(i AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |         FROM th, unnest(range(57)) AS u(i) GROUP BY 1, 2),
       |sim AS (SELECT doc_id, CAST(sum(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
       |                                     ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS s
       |        FROM bits GROUP BY 1)
       |SELECT a.doc_id AS ai, b.doc_id AS bi,
       |       CAST(bit_count(xor(a.s, b.s)) AS INT) AS hd
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.s, b.s)) <= 10 ORDER BY ai, bi""".stripMargin

  private val dedupSimhash = Q("llm_dedup_simhash", oSimhashSql) { (s, d) =>
    DedupOps.simhashNearDups(Tables.documents(s, d), maxHamming = 10)
      .orderBy("ai", "bi")
  }

  /** The SAME pair set through the banded (pigeonhole) scale path — the
    * form a 100 TB corpus runs, now under the hash oracle rather than
    * only spec-pinned equal to the kernel. */
  private val dedupSimhashBanded = Q("llm_dedup_simhash_banded", oSimhashSql) { (s, d) =>
    DedupOps.simhashNearDupsBanded(Tables.documents(s, d), maxHamming = 10)
      .orderBy("ai", "bi")
  }

  private val dedupFuzzy = Q(
    "llm_dedup_fuzzy",
    s"""WITH $oJaccardPairs
       |SELECT ai, bi, jac FROM j WHERE jac >= 0.8 ORDER BY ai, bi""".stripMargin) { (s, d) =>
    DedupOps.minhashNearDups(Tables.documents(s, d), minJaccard = 0.8)
      .orderBy("ai", "bi")
  }

  /** CROSS-EPOCH near-dup lookup against a SAVED index
    * ([[DedupOps.saveDedupIndex]] / [[DedupOps.dedupAgainstIndex]]) —
    * the growing-corpus production shape: the even-id half of the
    * corpus persists as a two-table plain-parquet index (MinHash band
    * buckets + hashed shingle sets, no text), and the odd-id half
    * dedups against it WITHOUT rescanning the old documents — banded
    * candidates, exact-Jaccard verify, stateless row-local serve
    * kernel. Oracle: the capped-exact cross-epoch pair set (the
    * [[dedupFuzzy]] oracle restricted to odd→even pairs), certifying
    * LSH recall + the persisted round-trip end to end. */
  private val dedupXepoch = Q(
    "llm_dedup_xepoch",
    s"""WITH $oShingles,
       |cold AS (SELECT sh FROM (SELECT sh, count(*) AS dfc FROM sh GROUP BY 1) WHERE dfc <= 1000),
       |cands AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
       |          FROM sh a JOIN cold USING (sh) JOIN sh b ON a.sh = b.sh
       |          WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT c.new_id, c.old_id, count(*) AS c
       |          FROM cands c JOIN sh a ON a.doc_id = c.new_id
       |          JOIN sh b ON b.doc_id = c.old_id AND b.sh = a.sh GROUP BY 1, 2),
       |j AS (SELECT new_id, old_id, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jac
       |      FROM inter JOIN sz sa ON sa.doc_id = new_id JOIN sz sb ON sb.doc_id = old_id)
       |SELECT new_id, old_id, jac FROM j WHERE jac >= 0.8 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val path = graft.Scratch.dirString("graft-dedup-index")
    DedupOps.saveDedupIndex(docs.filter(col("doc_id") % 2 === 0), path)
    DedupOps.dedupAgainstIndex(docs.filter(col("doc_id") % 2 === 1),
        path, minJaccard = 0.8)
      .distinct()
      .orderBy("new_id", "old_id")
  }

  /** The SAME cross-epoch lookup on the REAL streaming runtime: the
    * saved index stands, and the new epoch arrives as a 5-micro-batch
    * document stream — [[DedupOps.dedupAgainstIndex]] is row-local
    * (per-row signature + banding) plus stream-static equi-joins
    * against the two index tables, so each document is answered
    * within its own micro-batch with ZERO streaming state; the
    * replayed union (one row per colliding band) distinct-folds to
    * the batch answer under the same oracle. The ingest firewall for
    * near-duplicates, as [[graft.streaming.TextOps]]'
    * decontamination firewall is for eval overlap. */
  private val streamDedupXepochReplay = Q(
    "stream_dedup_xepoch_replay",
    s"""WITH $oShingles,
       |cold AS (SELECT sh FROM (SELECT sh, count(*) AS dfc FROM sh GROUP BY 1) WHERE dfc <= 1000),
       |cands AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
       |          FROM sh a JOIN cold USING (sh) JOIN sh b ON a.sh = b.sh
       |          WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT c.new_id, c.old_id, count(*) AS c
       |          FROM cands c JOIN sh a ON a.doc_id = c.new_id
       |          JOIN sh b ON b.doc_id = c.old_id AND b.sh = a.sh GROUP BY 1, 2),
       |j AS (SELECT new_id, old_id, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jac
       |      FROM inter JOIN sz sa ON sa.doc_id = new_id JOIN sz sb ON sb.doc_id = old_id)
       |SELECT new_id, old_id, jac FROM j WHERE jac >= 0.8 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val path = graft.Scratch.dirString("graft-dedup-index-stream")
    DedupOps.saveDedupIndex(docs.filter(col("doc_id") % 2 === 0), path)
    graft.streaming.BoundedReplay.replayDocuments(s, d)(stream =>
      DedupOps.dedupAgainstIndex(stream.filter(col("doc_id") % 2 === 1),
        path, minJaccard = 0.8))
      .distinct()
      .orderBy("new_id", "old_id")
  }

  /** Near-dup clustering: connected components over the Jaccard ≥ 0.5
    * pair graph, every document labeled with the min id reachable from
    * it. Oracle computes the same components via a recursive-CTE
    * transitive closure (edge set is small once thresholded, so the
    * closure is cheap on the oracle side; the Spark side stays the
    * scalable label-propagation loop). */
  private val dedupCluster = Q(
    "llm_dedup_cluster",
    s"""WITH RECURSIVE $oJaccardPairs,
       |p AS (SELECT ai, bi FROM j WHERE jac >= 0.5),
       |e AS (SELECT ai AS s, bi AS t FROM p UNION SELECT bi, ai FROM p),
       |reach(s, t) AS (
       |  SELECT s, s FROM (SELECT DISTINCT s FROM e)
       |  UNION
       |  SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
       |cl AS (SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY 1)
       |SELECT d.doc_id AS doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
       |FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = DedupOps.jaccardPairs(docs).filter(col("jac") >= 0.5)
    DedupOps.connectedComponents(pairs, docs).orderBy("doc_id")
  }

  /** Cluster-and-keep-best: the step a real dedup pipeline runs AFTER
    * clustering — from every near-dup cluster keep one representative
    * (longest doc, id as tiebreak) and report how many members it
    * absorbed. Composes [[DedupOps.connectedComponents]] with a
    * per-cluster argmax window; the oracle restates the components via
    * the recursive closure and the same argmax. */
  private val dedupKeepBest = Q(
    "llm_dedup_keepbest",
    s"""WITH RECURSIVE $oJaccardPairs,
       |p AS (SELECT ai, bi FROM j WHERE jac >= 0.5),
       |e AS (SELECT ai AS s, bi AS t FROM p UNION SELECT bi, ai FROM p),
       |reach(s, t) AS (
       |  SELECT s, s FROM (SELECT DISTINCT s FROM e)
       |  UNION
       |  SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
       |cl AS (SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY 1),
       |lab AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
       |               d.n_chars
       |        FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
       |SELECT cluster_id, doc_id AS kept, n_chars AS kept_chars,
       |       CAST(n_members AS BIGINT) AS n_members
       |FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
       |        ORDER BY n_chars DESC, doc_id) AS rn,
       |        count(*) OVER (PARTITION BY cluster_id) AS n_members
       |      FROM lab)
       |WHERE rn = 1 ORDER BY cluster_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = DedupOps.jaccardPairs(docs).filter(col("jac") >= 0.5)
    val labeled = DedupOps.connectedComponents(pairs, docs)
      .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
    labeled
      .withColumn("rn", row_number().over(
        w.orderBy(col("n_chars").desc, col("doc_id"))))
      .withColumn("n_members", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("kept"),
        col("n_chars").as("kept_chars"), col("n_members"))
      .orderBy("cluster_id")
  }

  /** Char-level duplicate-span profile ([[DedupOps.duplicateSpans]]):
    * strided 40-char grams, poly-hashed; a gram in ≥ 2 distinct docs is
    * a duplicated span. The oracle restates gram extraction + the same
    * hash ([[graft.functions.Hashes.oPolyHash]]) so the hash check pins
    * stride arithmetic, hashing, and the distinct-doc verdict. */
  private val dupSpans = Q(
    "llm_dup_spans",
    s"""WITH g AS (
       |  SELECT doc_id, substr(text, CAST(i AS INT) * 10 + 1, 40) AS gr
       |  FROM documents, unnest(range(CAST(floor((length(text) - 40) / 10) AS BIGINT) + 1)) AS u(i)
       |  WHERE length(text) >= 40),
       |h AS (SELECT doc_id, ${graft.functions.Hashes.oPolyHash("gr")} AS h FROM g),
       |d AS (SELECT h, count(DISTINCT doc_id) >= 2 AS is_dup FROM h GROUP BY 1)
       |SELECT doc_id, count(*) AS n_spans,
       |       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |       round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
       |             / count(*), 6) AS dup_ratio
       |FROM h JOIN d USING (h)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    DedupOps.duplicateSpans(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** End-to-end cleaning pipeline — the composition story: exact dedup
    * (keep-first per content hash) → quality filter (score_u ≥ 0.5 in
    * micro-units) → per-source corpus report. Each stage is an already
    * oracle-verified operator; this key pins that they COMPOSE without
    * column/semantic drift, which is how a user actually runs the
    * library. (The sf fixtures contain no exact dups, so the dedup
    * stage passes everything through — the filter does the real work;
    * both facts are hash-pinned.)
    * @note scale: dedup shuffles the content hash once, quality is a
    *   narrow projection, the report is one partial+final agg — the
    *   composed plan keeps each stage's scale shape. */
  private val pipelineClean = Q(
    "llm_pipeline_clean",
    """WITH kept AS (SELECT doc_id FROM (
      |    SELECT doc_id, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
      |    FROM documents) WHERE rn = 1),
      |q AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
      |  CAST(floor(1000000 * (
      |    0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / CAST(len(string_split(text, ' ')) AS DOUBLE))
      |    + 0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
      |    + 0.2 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |                   / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 10.0, 1.0))) AS BIGINT) AS score_u
      |  FROM documents)
      |SELECT d.source, count(*) AS n_docs,
      |  CAST(sum(q.n_tok) AS BIGINT) AS n_tok_total,
      |  CAST(sum(q.score_u) AS BIGINT) AS score_u_total
      |FROM kept k JOIN q ON q.doc_id = k.doc_id
      |JOIN documents d ON d.doc_id = k.doc_id
      |WHERE q.score_u >= 500000
      |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val kept = DedupOps.exactDedup(docs).select(col("kept").as("doc_id"))
    val clean = kept
      .join(graft.operators.TextOps.quality(docs), Seq("doc_id"))
      .filter(col("score_u") >= 500000L)
    clean.join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("n_tok_total"),
        sum(col("score_u")).as("score_u_total"))
      .orderBy("source")
  }

  /** URL-level dedup ([[DedupOps.canonicalizeUrl]]): four deterministic
    * URL variants per page synthesized from `documents` — a
    * `www.`/mixed-case/tracking-params form, a bare http form, an
    * uppercase-host/fragment/trailing-slash form, and one carrying a
    * REAL query param (`id=7`, which must survive and keep its row
    * distinct). Variants 0-2 of each page must collapse to one group,
    * variant 3 stays its own; keep-first by doc_id. */
  private val dedupUrl = Q(
    "llm_dedup_url",
    """WITH u AS (SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN 'https://www.Docs.example.com/page/'
      |        || CAST(doc_id // 4 AS VARCHAR) || '/?utm_source=feed&ref=1'
      |      WHEN 1 THEN 'http://docs.example.com/page/'
      |        || CAST(doc_id // 4 AS VARCHAR)
      |      WHEN 2 THEN 'HTTPS://DOCS.EXAMPLE.COM/page/'
      |        || CAST(doc_id // 4 AS VARCHAR) || '/#sec-2'
      |      ELSE 'https://docs.example.com/page/'
      |        || CAST(doc_id // 4 AS VARCHAR) || '?id=7&utm_campaign=x&b=2&a=1'
      |    END AS url FROM documents),
      |c AS (SELECT doc_id,
      |    host || path || CASE WHEN len(params) > 0
      |        THEN '?' || array_to_string(params, '&') ELSE '' END AS canon_url
      |  FROM (SELECT doc_id,
      |      regexp_replace(lower(regexp_extract(nofrag, '^([^/?]+)', 1)),
      |        '^www\.', '') AS host,
      |      regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
      |      list_sort(list_filter(string_split(
      |          regexp_extract(rest, '\?(.*)$', 1), '&'),
      |        p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|ref|fbclid)=')))
      |        AS params
      |    FROM (SELECT doc_id, nofrag,
      |        regexp_extract(nofrag, '^[^/?]*(.*)$', 1) AS rest
      |      FROM (SELECT doc_id,
      |          regexp_replace(regexp_replace(url, '^[a-zA-Z]+://', ''),
      |            '#.*$', '') AS nofrag FROM u))))
      |SELECT canon_url, min(doc_id) AS keep_id, count(*) AS n_urls
      |FROM c GROUP BY canon_url ORDER BY canon_url""".stripMargin) { (s, d) =>
    val url = expr("""CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN concat('https://www.Docs.example.com/page/',
        doc_id div 4, '/?utm_source=feed&ref=1')
      WHEN 1 THEN concat('http://docs.example.com/page/', doc_id div 4)
      WHEN 2 THEN concat('HTTPS://DOCS.EXAMPLE.COM/page/',
        doc_id div 4, '/#sec-2')
      ELSE concat('https://docs.example.com/page/', doc_id div 4,
        '?id=7&utm_campaign=x&b=2&a=1') END""")
    Tables.documents(s, d)
      .select(col("doc_id"), DedupOps.canonicalizeUrl(url).as("canon_url"))
      .groupBy("canon_url")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_urls"))
      .orderBy("canon_url")
  }

  /** Edit-distance similarity join ([[DedupOps.editSimilarityJoin]],
    * maxDist=3) over DISTINCT part names — "red widget" vs "red gadget"
    * style catalog-title near-matches. Candidates block on a shared
    * token (the signature-join contract, restated by the oracle);
    * distinct names first, so block sizes are vocabulary-bounded and
    * scale-invariant. */
  private val editJoin = Q(
    "llm_edit_join",
    """WITH named AS (SELECT min(p_partkey) AS id, p_name AS s
      |    FROM part GROUP BY p_name),
      |tok AS (SELECT id, s, unnest(list_distinct(string_split(s, ' '))) AS tok
      |    FROM named),
      |hot AS (SELECT tok FROM tok GROUP BY tok HAVING count(*) > 1000),
      |cold AS (SELECT * FROM tok ANTI JOIN hot USING (tok)),
      |cand AS (SELECT DISTINCT a.id AS ai, b.id AS bi, a.s AS a_s, b.s AS b_s
      |    FROM cold a JOIN cold b ON a.tok = b.tok AND a.id < b.id)
      |SELECT ai, bi, a_s, b_s, CAST(levenshtein(a_s, b_s) AS INT) AS dist
      |FROM cand WHERE levenshtein(a_s, b_s) <= 3
      |ORDER BY ai, bi""".stripMargin) { (s, d) =>
    val named = Tables.part(s, d).groupBy("p_name")
      .agg(min("p_partkey").as("id"))
      .select(col("id").as("doc_id"), col("p_name").as("text"))
    graft.operators.DedupOps.editSimilarityJoin(named, maxDist = 3)
      .orderBy("ai", "bi")
  }

  /** EXACT edit-distance join ([[DedupOps.editJoinExact]], PassJoin
    * segment signatures, d=2) — unlike [[editJoin]]'s token-blocking
    * contract, this finds EVERY pair within distance 2, and the oracle
    * is a genuinely independent brute-force all-pairs levenshtein (no
    * blocking logic restated), so the hash gate certifies the
    * signature scheme's completeness end to end. */
  private val editJoinExact = Q(
    "llm_edit_join_exact",
    """WITH named AS (SELECT min(p_partkey) AS id, p_name AS s
      |    FROM part GROUP BY p_name)
      |SELECT a.id AS ai, b.id AS bi, a.s AS a_s, b.s AS b_s,
      |       CAST(levenshtein(a.s, b.s) AS INT) AS dist
      |FROM named a JOIN named b ON a.id < b.id
      |WHERE levenshtein(a.s, b.s) <= 2
      |ORDER BY ai, bi""".stripMargin) { (s, d) =>
    val named = Tables.part(s, d).groupBy("p_name")
      .agg(min("p_partkey").as("id"))
      .select(col("id").as("doc_id"), col("p_name").as("text"))
    graft.operators.DedupOps.editJoinExact(named, maxDist = 2)
      .orderBy("ai", "bi")
  }

  /** PassJoin on DOCUMENT-length strings ([[DedupOps.editJoinExactLong]],
    * d=4 — the fixture's planted token-substitution near-dups sit at
    * char distance 4): hashed segment signatures keep the candidate
    * shuffle at O(d³) bytes per document instead of shipping raw
    * substrings. The oracle is an independent brute force over
    * length-banded pairs with a character-count prefilter (each edit
    * changes Σ_c |Δcount(c)| by ≤ 2, so Σ over any character subset
    * ≤ 2d is a necessary condition — pure arithmetic, no segment
    * logic restated), certifying the hashed-signature scheme's
    * completeness on real document texts. */
  private val editJoinLong = Q(
    "llm_edit_join_long",
    """WITH docs AS (SELECT doc_id AS id, text AS s,
      |       length(text) - length(replace(text, 'a', '')) AS ca,
      |       length(text) - length(replace(text, 'e', '')) AS ce,
      |       length(text) - length(replace(text, 't', '')) AS ct,
      |       length(text) - length(replace(text, 's', '')) AS cs
      |     FROM documents)
      |SELECT a.id AS ai, b.id AS bi, CAST(levenshtein(a.s, b.s) AS INT) AS dist
      |FROM docs a JOIN docs b ON a.id < b.id
      |  AND abs(length(a.s) - length(b.s)) <= 4
      |  AND abs(a.ca-b.ca) + abs(a.ce-b.ce) + abs(a.ct-b.ct) + abs(a.cs-b.cs) <= 8
      |WHERE levenshtein(a.s, b.s) <= 4
      |ORDER BY ai, bi""".stripMargin) { (s, d) =>
    graft.operators.DedupOps.editJoinExactLong(Tables.documents(s, d), maxDist = 4)
      .orderBy("ai", "bi")
  }

  /** "Related documents" — top-3 most similar docs PER DOC by exact
    * shingle Jaccard, candidate generation routed through the
    * MinHash-LSH banding machinery ([[DedupOps.bandedCandidates]], the
    * `llm_dedup_fuzzy` stage) with exact rerank: per doc, the top-3
    * banded candidates by full-set Jaccard, ranked through the
    * [[graft.operators.SimilarityOps.topKScored]] partial top-k
    * aggregate (the kNN ranking tail — the exchange carries
    * ≤ partitions·docs·k entries, not the candidate set). The banded
    * contract replaces the r8 df-cap-100 form, whose candidate join
    * (Σ min(df,100)² shingle pairs) was still the heaviest key at the
    * 10× stress point; bucket mass tracks true near-duplicate mass.
    * The oracle REBUILDS the 64-permutation signature and band
    * arithmetic in SQL (plain integer math — the CMS pattern), so the
    * routed candidate set itself is hash-verified, not assumed. */
  private val topkSimilar = Q(
    "llm_topk_similar",
    s"""WITH $oShingles,
       |th AS (SELECT doc_id, ${graft.functions.Hashes.oPolyHash("sh")} % 2147483647 AS x FROM sh),
       |mh AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i,
       |         min(((2*CAST(u.i AS BIGINT)+1)*x + (1000003*CAST(u.i AS BIGINT)+12345)) % 2147483647) AS mv
       |       FROM th, unnest(range(64)) AS u(i) GROUP BY 1, 2),
       |bs AS (SELECT doc_id, CAST(i // 4 AS INT) AS band,
       |         string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i) AS bsig
       |       FROM mh GROUP BY 1, 2),
       |cands AS (SELECT DISTINCT a.doc_id AS ai, b.doc_id AS bi
       |          FROM bs a JOIN bs b ON a.band = b.band AND a.bsig = b.bsig
       |            AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT c.ai, c.bi, count(*) AS c
       |          FROM cands c JOIN sh a ON a.doc_id = c.ai
       |          JOIN sh b ON b.doc_id = c.bi AND b.sh = a.sh GROUP BY 1, 2),
       |j AS (SELECT ai, bi, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jac
       |      FROM inter JOIN sz sa ON sa.doc_id = ai JOIN sz sb ON sb.doc_id = bi),
       |d AS (SELECT ai AS qid, bi AS nbr, jac FROM j
       |      UNION ALL SELECT bi, ai, jac FROM j),
       |r AS (SELECT qid, nbr, jac, CAST(row_number() OVER (
       |        PARTITION BY qid ORDER BY jac DESC, nbr) AS INT) AS rk FROM d)
       |SELECT qid, nbr, jac, rk FROM r WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin) { (s, d) =>
    // persist: the signature build and the exact-Jaccard rerank both
    // consume the hashed shingles; the mirror union consumes the
    // reranked pairs twice
    val hs = DedupOps.hashedShingles(Tables.documents(s, d)).persist()
    val pairs = DedupOps.jaccardForHashed(
      DedupOps.bandedCandidates(hs), hs).persist()
    val both = pairs
      .select(col("ai").as("qid"), col("bi").as("nbr"), col("jac"))
      .unionByName(pairs
        .select(col("bi").as("qid"), col("ai").as("nbr"), col("jac")))
    graft.operators.SimilarityOps.topKScored(both, 3, "jac")
      .orderBy("qid", "rk")
  }

  /** CERTIFIED-COMPLETE related docs: top-3 neighbors PER DOC among
    * `jac ≥ 4/5` pairs, candidates from the prefix-filtered COMPLETE
    * join ([[DedupOps.jaccardPairsComplete]]) — unlike
    * [[topkSimilar]]'s LSH-candidate contract, a doc provably ranks
    * over EVERY neighbor above the threshold, so the oracle is the
    * brute-force all-shared-pairs restatement, mirrored and ranked.
    * The two keys bracket the production trade: unthresholded
    * LSH-probabilistic vs thresholded deterministic-complete. */
  private val topkRelated = Q(
    "llm_topk_related",
    s"""WITH $oShingles,
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS ai, b.doc_id AS bi, count(*) AS c
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |j AS (SELECT ai, bi,
       |        round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jac
       |      FROM inter JOIN sz sa ON sa.doc_id = ai
       |           JOIN sz sb ON sb.doc_id = bi
       |      WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.8),
       |d AS (SELECT ai AS qid, bi AS nbr, jac FROM j
       |      UNION ALL SELECT bi, ai, jac FROM j),
       |r AS (SELECT qid, nbr, jac, CAST(row_number() OVER (
       |        PARTITION BY qid ORDER BY jac DESC, nbr) AS INT) AS rk FROM d)
       |SELECT qid, nbr, jac, rk FROM r WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin) { (s, d) =>
    val pairs = DedupOps.jaccardPairsComplete(Tables.documents(s, d),
      tNum = 4, tDen = 5).persist()
    val both = pairs
      .select(col("ai").as("qid"), col("bi").as("nbr"), col("jac"))
      .unionByName(pairs
        .select(col("bi").as("qid"), col("ai").as("nbr"), col("jac")))
    graft.operators.SimilarityOps.topKScored(both, 3, "jac")
      .orderBy("qid", "rk")
  }

  /** Containment near-dups at max-containment ≥ 4/5
    * ([[DedupOps.containmentPairsComplete]]): pairs where ≥ 80% of ONE
    * side's shingles sit inside the other — the asymmetric
    * quote/subset detector symmetric Jaccard misses (a short doc fully
    * quoted in a long one has tiny jac but cont_short ≈ 1). The r8
    * df-capped form ([[DedupOps.containmentPairs]], the small-corpus
    * fast path) was the heaviest shingle-family key at 10× stress
    * (99.9 s, Σ min(df,cap)² candidate mass); the prefix-filtered form
    * joins only each document's rarest ~20% of shingles against the
    * corpus and is COMPLETE at the threshold — so the oracle here is a
    * genuinely independent brute-force all-shared-pairs restatement
    * (no prefix logic restated), certifying completeness end to end. */
  private val containment = Q(
    "llm_containment",
    s"""WITH $oShingles,
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS ai, b.doc_id AS bi, count(*) AS c
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT ai, bi,
       |  round(CAST(c AS DOUBLE) / sa.n, 6) AS cont_a,
       |  round(CAST(c AS DOUBLE) / sb.n, 6) AS cont_b
       |FROM inter JOIN sz sa ON sa.doc_id = ai JOIN sz sb ON sb.doc_id = bi
       |WHERE greatest(round(CAST(c AS DOUBLE) / sa.n, 6),
       |               round(CAST(c AS DOUBLE) / sb.n, 6)) >= 0.8
       |ORDER BY ai, bi""".stripMargin) { (s, d) =>
    DedupOps.containmentPairsComplete(Tables.documents(s, d), tNum = 4, tDen = 5)
      .orderBy("ai", "bi")
  }

  /** The COMPLETE Jaccard contract on the REAL streaming path
    * ([[graft.streaming.StreamOps.jaccardCompleteStream]]): documents
    * replayed through 5 real micro-batches build the TTL'd keyed-state
    * prefix index incrementally, and the union of emitted pairs must
    * hash-match the SAME independent brute-force oracle as the batch
    * [[dedupNgramComplete]] — closing the loop the batch complete join
    * opened: LSH recall was certified against the complete batch form,
    * and the complete form itself now runs incrementally. The df
    * snapshot passed in is the batch corpus's own shingle-df table
    * (the epoch-refresh production pattern), so the streaming index
    * uses the identical rarity order; the one-year ttl exceeds the
    * replay's synthetic ingest span, so no pair crosses the TTL
    * horizon and replay == batch exactly. */
  private val streamDedupCompleteReplay = Q(
    "stream_dedup_complete_replay", dedupNgramComplete.oracle.get) { (s, d) =>
    val dfStats = DedupOps.hashedShingles(Tables.documents(s, d))
      .groupBy("h").agg(count(lit(1)).as("gdf"))
    val out = graft.streaming.BoundedReplay.replayDocuments(s, d)(docs =>
      graft.streaming.StreamOps.jaccardCompleteStream(docs, tNum = 4, tDen = 5,
        tsCol = Some("ts"), ttl = "365 days", dfStats = Some(dfStats)).toDF())
    out.orderBy("ai", "bi")
  }

  /** The COMPLETE containment contract on the REAL streaming path, in
    * the production flag→confirm split
    * ([[graft.streaming.StreamOps.containmentCandidatesStream]]):
    * documents replayed through 5 real micro-batches maintain the
    * TTL'd id+size inverted index (prefix-flagged postings — the
    * batch prefix⋈full bound, incremental), the union of flagged
    * pairs is exact-verified against the doc store
    * ([[DedupOps.containmentForHashed]]), and the confirmed set must
    * hash-match the SAME independent brute-force oracle as the batch
    * [[containment]] key. Jaccard got the in-state-verified twin
    * ([[streamDedupCompleteReplay]]); containment gets the
    * candidates+verify split because its bound covers only the
    * smaller side (full-array postings would be O(m²)/doc — the
    * scaladoc documents the trade). */
  private val streamContainmentCompleteReplay = Q(
    "stream_containment_complete_replay", containment.oracle.get) { (s, d) =>
    val cands = graft.streaming.BoundedReplay.replayDocuments(s, d)(docs =>
      graft.streaming.StreamOps.containmentCandidatesStream(docs,
        tNum = 4, tDen = 5, tsCol = Some("ts"), ttl = "365 days").toDF())
      .distinct()
    DedupOps.containmentForHashed(cands,
        DedupOps.hashedShingles(Tables.documents(s, d)))
      .filter(greatest(col("cont_a"), col("cont_b")) >= lit(4.0 / 5))
      .orderBy("ai", "bi")
  }

  /** The WHOLE training-data pipeline as ONE composed, hash-verified
    * program — the capstone "switch your engine" exhibit: benchmark
    * split-off → exact dedup (sha256 keep-first) → COMPLETE near-dup
    * clustering at t = 4/5 (prefix-filtered join + connected
    * components, keep each cluster's min id) → decontamination
    * against the held-out suite → quality floor → deterministic 50%
    * hash sample → per-source corpus report. Every stage is an
    * already-verified library operator; this key certifies their
    * COMPOSITION (column contracts, filter interactions, determinism
    * end to end) against an oracle that restates all six stages —
    * including the recursive-CTE transitive closure and the brute
    * force near-dup join.
    * @note scale: the composed plan keeps each stage's own scale
    *   shape — one content-hash shuffle, the prefix-bounded candidate
    *   join, a broadcast eval index, narrow projections, and a
    *   metadata-sized report agg. Nothing widens at composition. */
  private val pipelineFull = Q(
    "llm_pipeline_full",
    s"""WITH RECURSIVE
       |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
       |tr AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
       |k1 AS (SELECT doc_id FROM (
       |    SELECT doc_id, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
       |    FROM tr) WHERE rn = 1),
       |toks AS (SELECT t.doc_id, string_split(t.text, ' ') AS tt
       |         FROM tr t JOIN k1 USING (doc_id)),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(tt) - 2),
       |         i -> concat_ws(' ', tt[i+1], tt[i+2], tt[i+3])))) AS sh FROM toks),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS ai, b.doc_id AS bi, count(*) AS c
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |p AS (SELECT ai, bi FROM inter
       |      JOIN sz sa ON sa.doc_id = ai JOIN sz sb ON sb.doc_id = bi
       |      WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.8),
       |e AS (SELECT ai AS s, bi AS t FROM p UNION SELECT bi, ai FROM p),
       |reach(s, t) AS (
       |  SELECT s, s FROM (SELECT DISTINCT s FROM e)
       |  UNION
       |  SELECT r.s, e2.t FROM reach r JOIN e e2 ON r.t = e2.s),
       |cl AS (SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY 1),
       |k2 AS (SELECT k1.doc_id FROM k1 LEFT JOIN cl USING (doc_id)
       |       WHERE coalesce(cl.cluster_id, k1.doc_id) = k1.doc_id),
       |etoks AS (SELECT doc_id, string_split(text, ' ') AS tt FROM ev),
       |esh AS (SELECT doc_id AS eval_id, unnest(list_distinct(list_transform(range(len(tt) - 2),
       |          i -> concat_ws(' ', tt[i+1], tt[i+2], tt[i+3])))) AS sh FROM etoks),
       |tsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN k2 USING (doc_id)),
       |ov AS (SELECT tsh.doc_id, esh.eval_id, count(*) AS c
       |       FROM tsh JOIN esh USING (sh) GROUP BY 1, 2),
       |mx AS (SELECT doc_id, max(c) AS mxs FROM ov GROUP BY 1),
       |k3 AS (SELECT k2.doc_id FROM k2 LEFT JOIN mx USING (doc_id)
       |       WHERE coalesce(mx.mxs, 0) < 5),
       |q AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
       |  CAST(floor(1000000 * (
       |    0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |           / CAST(len(string_split(text, ' ')) AS DOUBLE))
       |    + 0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
       |    + 0.2 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
       |                   / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 10.0, 1.0))) AS BIGINT) AS score_u
       |  FROM tr),
       |k4 AS (SELECT k3.doc_id FROM k3 JOIN q USING (doc_id) WHERE q.score_u >= 500000),
       |k5 AS (SELECT doc_id FROM k4
       |       WHERE ${graft.operators.SampleOps.oIdHash("doc_id")} < CAST(floor(0.5 * 2147483648) AS BIGINT))
       |SELECT d.source, count(*) AS n_docs, CAST(sum(q.n_tok) AS BIGINT) AS n_tok_total
       |FROM k5 JOIN documents d USING (doc_id) JOIN q USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import graft.operators.SampleOps
    val docs = Tables.documents(s, d)
    val ev = docs.filter(col("doc_id") % 50 === 0)
    val tr = docs.filter(col("doc_id") % 50 =!= 0)
    val d1 = tr.join(
      DedupOps.exactDedup(tr).select(col("kept").as("doc_id")), "doc_id")
    val pairs = DedupOps.jaccardPairsComplete(d1, tNum = 4, tDen = 5)
      .select("ai", "bi")
    val d2 = d1.join(DedupOps.connectedComponents(pairs, d1), "doc_id")
      .filter(col("cluster_id") === col("doc_id")).drop("cluster_id")
    val d3 = d2.join(
      graft.operators.TextOps.decontaminate(d2, ev, minShared = 5)
        .filter(!col("contaminated")).select("doc_id"), "doc_id")
    val d4 = d3.join(graft.operators.TextOps.quality(tr), "doc_id")
      .filter(col("score_u") >= 500000L)
    SampleOps.hashSample(d4, rate = 0.5)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("n_tok_total"))
      .orderBy("source")
  }

  /** [[pipelineFull]] with its INGEST half on the REAL streaming
    * runtime ([[graft.streaming.CleanPipeline.ingestWithFirewall]]):
    * both per-document ingest decisions — content-hash keep-first
    * dedup (keyed state) and the contamination-firewall verdict
    * (broadcast benchmark index) — are made the moment each document
    * arrives across 5 real micro-batches; the cross-document stages
    * (complete near-dup clustering, quality floor, deterministic
    * sample, report) run as the downstream confirm step. Ingest ∪
    * confirm must hash-match the SAME six-stage oracle as the batch
    * capstone — the production split of the same pipeline, certified
    * equal. */
  private val streamPipelineFullReplay = Q(
    "stream_pipeline_full_replay", pipelineFull.oracle.get) { (s, d) =>
    import graft.operators.SampleOps
    val docs = Tables.documents(s, d)
    val ev = docs.filter(col("doc_id") % 50 === 0)
    val keepers = graft.streaming.BoundedReplay.replayDocuments(s, d)(stream =>
      graft.streaming.CleanPipeline.ingestWithFirewall(
        stream.filter(col("doc_id") % 50 =!= 0), ev, minShared = 5).toDF())
    val pairs = DedupOps.jaccardPairsComplete(keepers, tNum = 4, tDen = 5)
      .select("ai", "bi")
    val k2 = keepers.join(DedupOps.connectedComponents(pairs, keepers), "doc_id")
      .filter(col("cluster_id") === col("doc_id"))
    val k3 = k2.filter(!col("contaminated"))
    val k4 = k3.join(
        graft.operators.TextOps.quality(k3.select("doc_id", "text")), "doc_id")
      .filter(col("score_u") >= 500000L)
    SampleOps.hashSample(k4, rate = 0.5)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("n_tok_total"))
      .orderBy("source")
  }

  /** The PERMISSIVE-threshold (t = 1/2) dedup contract on the REAL
    * streaming path, in the flag→confirm split
    * ([[graft.streaming.StreamOps.jaccardCappedStream]]): documents
    * replayed through 5 real micro-batches maintain the TTL'd
    * df-capped id-only inverted index (the batch
    * [[DedupOps.jaccardPairs]] hot-shingle contract, incremental —
    * only the HOT set is broadcast), the union of flagged pairs is
    * exact-verified against the doc store
    * ([[DedupOps.jaccardForHashed]], full sets incl. hot shingles)
    * and thresholded at 0.5, and the confirmed set must hash-match
    * [[dedupNgram]]'s own capped oracle. Completes the streaming
    * dedup regime split: t = 4/5 runs the COMPLETE prefix index
    * ([[streamDedupCompleteReplay]]), exploratory t = 1/2 runs this
    * capped form — same levers as batch. */
  private val streamDedupCappedReplay = Q(
    "stream_dedup_capped_replay", dedupNgram.oracle.get) { (s, d) =>
    val dfStats = DedupOps.hashedShingles(Tables.documents(s, d))
      .groupBy("h").agg(count(lit(1)).as("gdf"))
    val cands = graft.streaming.BoundedReplay.replayDocuments(s, d,
        sinkPartitions = 8)(docs =>
      graft.streaming.StreamOps.jaccardCappedStream(docs, dfStats,
        maxShingleDf = 1000L, tsCol = Some("ts"), ttl = "365 days").toDF())
      .distinct()
    DedupOps.jaccardForHashed(cands,
        DedupOps.hashedShingles(Tables.documents(s, d)))
      .filter(col("jac") >= 0.5)
      .orderBy("ai", "bi")
  }

  val all: Seq[Q] = Seq(dedupExact, dedupNgram, dedupNgramComplete,
    dedupSimhash, dedupSimhashBanded,
    dedupFuzzy, dedupXepoch, streamDedupXepochReplay,
    pipelineClean, dedupCluster, dedupKeepBest, dupSpans, dedupUrl,
    editJoin, editJoinExact, editJoinLong, topkSimilar, topkRelated, containment,
    streamDedupCompleteReplay, streamContainmentCompleteReplay,
    streamDedupCappedReplay, pipelineFull, streamPipelineFullReplay)
}
