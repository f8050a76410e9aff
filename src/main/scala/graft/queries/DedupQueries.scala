package graft.queries

import graft.{Q, Tables}
import graft.functions.Hashes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication family (SURVEY.md §2.10 L1/L2 + the
  * training-pipeline extras): exact, n-gram Jaccard, SimHash, and
  * MinHash+LSH. All hashes are the cross-engine [[Hashes.polyHash]] so
  * every key is DuckDB-oracle-checked, including the probabilistic ones
  * (LSH candidates are verified with exact Jaccard, so the declared
  * output is the exact near-dup pair set — the LSH layer only bounds the
  * candidate space).
  *
  * Shingle facts on this corpus (verified): trigram Jaccard cleanly
  * separates the 25 planted near-dup pairs (all ≥ 0.8; no background
  * pair reaches 0.3); shingle-feature SimHash at Hamming ≤ 10 selects
  * exactly the same 25 pairs (background starts at 12).
  *
  * @note scale: the shingle equi-join is the scalable core — shuffle on
  *   the shingle hash, not a doc×doc cross join. At 100 TB, cap hot
  *   shingles (drop df > threshold, they carry no dedup signal) and the
  *   join stays balanced; AQE skew-split covers the rest. MinHash-LSH
  *   replaces the pair space with band-bucket groups — the only
  *   all-pairs work left is inside a bucket.
  */
object DedupQueries {

  /** Distinct token-trigram shingles per doc: `doc_id, sh`. */
  private def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))).as("sh"))

  /** DuckDB CTE fragment producing the identical `sh(doc_id, sh)` set. */
  private val oShingles =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(t) - 2),
      |         i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))) AS sh FROM toks)""".stripMargin

  /** Exact pairwise trigram Jaccard via the shingle equi-join:
    * `ai, bi, c (intersection), jac`. The join key is the 57-bit shingle
    * hash, not the string — same shuffle, far cheaper key compare; with
    * ~2^18 distinct shingles per 2^57 hash space the collision term is
    * ~1e-7 and the counts equal the string-keyed oracle's. */
  private def jaccardPairs(docs: DataFrame): DataFrame = {
    val sh = shingles(docs).withColumn("h", Hashes.polyHash(col("sh")))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // shuffle_hash beats the planner's broadcast here: the shingle set
    // under-estimates below the broadcast threshold but costs ~2x to
    // replicate per task; at lake scale the same join is a shuffle anyway
    val inter = sh.as("a").hint("shuffle_hash")
      .join(sh.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ai"), col("b.doc_id").as("bi"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sz.as("sa"), col("ai") === col("sa.doc_id"))
      .join(sz.as("sb"), col("bi") === col("sb.doc_id"))
      .select(col("ai"), col("bi"),
        round(col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c")), 6).as("jac"))
  }

  /** Exact Jaccard computed ONLY for the given candidate pairs, via
    * per-doc shingle-hash arrays + `array_intersect` (hash-based, no
    * sort needed) — the LSH-side kernel: cost is |candidates| ×
    * |shingle set|, never the full pair space. */
  private def jaccardFor(cands: DataFrame, docs: DataFrame): DataFrame = {
    val sets = shingles(docs).withColumn("h", Hashes.polyHash(col("sh")))
      .groupBy("doc_id")
      .agg(collect_list(col("h")).as("xs"), count(lit(1)).as("n"))
    cands
      .join(sets.as("sa"), col("ai") === col("sa.doc_id"))
      .join(sets.as("sb"), col("bi") === col("sb.doc_id"))
      .withColumn("c", size(array_intersect(col("sa.xs"), col("sb.xs"))).cast("double"))
      .select(col("ai"), col("bi"),
        round(col("c") / (col("sa.n") + col("sb.n") - col("c")), 6).as("jac"))
  }

  private val oJaccardPairs =
    s"""$oShingles,
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS ai, b.doc_id AS bi, count(*) AS c
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |j AS (SELECT ai, bi, round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jac
       |      FROM inter JOIN sz sa ON sa.doc_id = ai JOIN sz sb ON sb.doc_id = bi)""".stripMargin

  // ------------------------------------------------------------ L1 exact dedup
  /** Exact dedup: sha-256 content groups, deterministic keep-first by
    * doc_id (never bare dropDuplicates — SURVEY §8.3). */
  private val dedupExact = Q(
    "llm_dedup_exact",
    """SELECT doc_id AS kept, h, CAST(cnt AS BIGINT) AS dup_count
      |FROM (SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS cnt,
      |             row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      |      FROM (SELECT doc_id, sha256(text) AS h FROM documents))
      |WHERE rn = 1 ORDER BY kept""".stripMargin) { (s, d) =>
    val hashed = Tables.documents(s, d)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val wCnt = Window.partitionBy(col("h"))
    val wRn = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    hashed
      .withColumn("cnt", count(lit(1)).over(wCnt))
      .withColumn("rn", row_number().over(wRn))
      .filter(col("rn") === 1)
      .select(col("doc_id").as("kept"), col("h"), col("cnt").as("dup_count"))
      .orderBy("kept")
  }

  // ------------------------------------------------------------ n-gram Jaccard
  /** Near-dup pairs by exact trigram Jaccard ≥ 0.5. */
  private val dedupNgram = Q(
    "llm_dedup_ngram",
    s"""WITH $oJaccardPairs
       |SELECT ai, bi, jac FROM j WHERE jac >= 0.5 ORDER BY ai, bi""".stripMargin) { (s, d) =>
    jaccardPairs(Tables.documents(s, d))
      .filter(col("jac") >= 0.5)
      .orderBy("ai", "bi")
  }

  // ------------------------------------------------------------ SimHash
  /** 57-bit SimHash over shingle hashes (the polyHash domain is < 2^57); near-dup = Hamming ≤ 10.
    * Bit i votes +1/-1 per shingle, the signature packs the vote signs.
    *
    * @note scale: the signature is one BIGINT per doc; the pair stage
    *   here is all-pairs for oracle parity — at 100 TB band the
    *   signature into 4×15-bit prefixes and equi-join buckets (any pair
    *   at Hamming ≤ 10 shares ≥ 1 exact band by pigeonhole over 4 bands
    *   only when hd ≤ 3; use 11 bands for hd ≤ 10), then verify. */
  private val dedupSimhash = Q(
    "llm_dedup_simhash",
    s"""WITH $oShingles,
       |th AS (SELECT doc_id, ${Hashes.oPolyHash("sh")} AS h FROM sh),
       |bits AS (SELECT doc_id, i, sum(CASE WHEN (h >> CAST(i AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |         FROM th, unnest(range(57)) AS u(i) GROUP BY 1, 2),
       |sim AS (SELECT doc_id, CAST(sum(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
       |                                     ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS s
       |        FROM bits GROUP BY 1)
       |SELECT a.doc_id AS ai, b.doc_id AS bi,
       |       CAST(bit_count(xor(a.s, b.s)) AS INT) AS hd
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.s, b.s)) <= 10 ORDER BY ai, bi""".stripMargin) { (s, d) =>
    // One-pass typed Aggregator builds the 57-bit signature with a
    // constant-size vote buffer — no bit-row explode, map-side partials.
    val simSig = udaf(graft.functions.SketchAggregators.SimHashSig,
      org.apache.spark.sql.Encoders.scalaLong)
    val th = shingles(Tables.documents(s, d))
      .withColumn("h", Hashes.polyHash(col("sh")))
    val sim = th.groupBy("doc_id").agg(simSig(col("h")).as("s"))
    sim.as("a").join(sim.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ai"), col("b.doc_id").as("bi"),
        expr("bit_count(a.s ^ b.s)").cast("int").as("hd"))
      .filter(col("hd") <= 10)
      .orderBy("ai", "bi")
  }

  // ------------------------------------------------------------ L2 MinHash+LSH
  /** MinHash (64 permutations) + LSH banding (16 bands × 4 rows), then
    * exact-Jaccard verification of candidates at τ = 0.8. The declared
    * output is the exact τ-near-dup pair set: for J ≥ 0.8 the miss
    * probability per pair is (1 − 0.8⁴)⁴⁰⁹⁶-ish ≈ 0 at this band shape
    * ((1-J^4)^16 ≤ 4e-4 at J=0.8, ≈4e-8 at the observed J ≥ 0.9), and
    * the exact filter removes false positives, so LSH candidates ∘
    * exact-Jaccard ≡ exact pairs on this corpus (verified).
    *
    * MinHash domain is reduced mod 2^31−1 so h_i(x) = (aᵢ·x + bᵢ) mod
    * 2^31−1 stays inside 64-bit arithmetic on both engines. */
  private val dedupFuzzy = Q(
    "llm_dedup_fuzzy",
    s"""WITH $oJaccardPairs
       |SELECT ai, bi, jac FROM j WHERE jac >= 0.8 ORDER BY ai, bi""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val M = 2147483647L
    // One-pass typed Aggregator ([[SketchAggregators.MinHashSig]]):
    // 64 permutation minima in a constant-size buffer, map-side partials
    // — replaces a 64×-explode + 16M-row shuffle.
    val minhashSig = udaf(graft.functions.SketchAggregators.MinHashSig,
      org.apache.spark.sql.Encoders.scalaLong)
    val sig = shingles(docs)
      .withColumn("x", Hashes.polyHash(col("sh")) % M)
      .groupBy("doc_id").agg(minhashSig(col("x")).as("sig"))
    val bands = sig
      .select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("band"), col("sig"))
      .withColumn("bsig", expr(
        "concat_ws(',', transform(slice(sig, band*4 + 1, 4), v -> CAST(v AS STRING)))"))
      .select("doc_id", "band", "bsig")
    val cands = bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") &&
        col("a.bsig") === col("b.bsig") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ai"), col("b.doc_id").as("bi")).distinct()
    jaccardFor(cands, docs)
      .filter(col("jac") >= 0.8)
      .orderBy("ai", "bi")
  }

  val all: Seq[Q] = Seq(dedupExact, dedupNgram, dedupSimhash, dedupFuzzy)
}
