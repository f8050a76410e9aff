package graft.queries

import graft.{Q, Tables}
import graft.operators.PackOps
import org.apache.spark.sql.functions.col

/** Training-sequence assembly keys over `documents`: context-window
  * chunking and token-budget packing (see [[graft.operators.PackOps]]).
  * Both are integer/token-exact, so the DuckDB oracles hash-match.
  */
object PackQueries {

  // 16-token windows advancing by 12 → every fixture doc (≈30-80
  // tokens) exercises the multi-chunk path including a short tail.
  private val chunk = Q(
    "llm_chunk",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |p AS (SELECT doc_id, t,
      |        CASE WHEN len(t) <= 16 THEN 1
      |             ELSE (len(t) - 16 + 11) // 12 + 1 END AS nc
      |      FROM toks),
      |c AS (SELECT doc_id, CAST(i AS INT) AS chunk_id,
      |        t[i*12 + 1 : i*12 + 16] AS ch
      |      FROM p, unnest(range(nc)) AS u(i))
      |SELECT doc_id, chunk_id, CAST(len(ch) AS INT) AS n_tok,
      |  array_to_string(ch, ' ') AS chunk_text
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    PackOps.chunk(Tables.documents(s, d), size = 16, overlap = 4)
      .orderBy("doc_id", "chunk_id")
  }

  private val seqPack = Q(
    "llm_seq_pack",
    """WITH d AS (SELECT source, doc_id,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |           FROM documents),
      |c AS (SELECT *, CAST(coalesce(sum(n_tok) OVER (
      |        PARTITION BY source ORDER BY doc_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |        AS cum_before FROM d)
      |SELECT source, doc_id, n_tok, cum_before, cum_before // 512 AS bin
      |FROM c ORDER BY source, doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("source"), col("doc_id"),
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("n_tok"))
    PackOps.packBins(docs, budget = 512).orderBy("source", "doc_id")
  }

  /** Content-defined chunking ([[graft.operators.TextOps.cdcChunks]],
    * 3-token rolling window, modulus 8): boundaries anchored to content
    * so shared spans chunk identically across documents — the
    * sub-document dedup primitive; the oracle restates the rolling-hash
    * boundary rule and every chunk hash. */
  private val cdcChunks = Q(
    "llm_cdc_chunks",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |b AS (SELECT doc_id, t, len(t) AS n,
       |    list_filter(list_transform(range(3, len(t) + 1), i ->
       |      CASE WHEN ${graft.functions.Hashes.oPolyHash("array_to_string(t[i-2:i], ' ')")} % 8 = 0
       |           THEN i END), x -> x IS NOT NULL) AS bp
       |  FROM toks WHERE len(t) >= 3),
       |s AS (SELECT doc_id, t, n,
       |    list_prepend(1, list_transform(bp, x -> x + 1)) AS starts,
       |    list_append(bp, n) AS ends FROM b),
       |c AS (SELECT doc_id, CAST(j AS INT) AS chunk_id,
       |    starts[j + 1] AS st, ends[j + 1] AS en, t
       |  FROM s, unnest(range(len(starts))) AS u(j))
       |SELECT doc_id, chunk_id, CAST(st AS INT) AS start_tok,
       |  CAST(en AS INT) AS end_tok, CAST(en - st + 1 AS INT) AS n_tok,
       |  ${graft.functions.Hashes.oPolyHash("array_to_string(t[st:en], ' ')")} AS chunk_hash
       |FROM c WHERE st <= en
       |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    graft.operators.TextOps.cdcChunks(Tables.documents(s, d))
      .orderBy("doc_id", "chunk_id")
  }

  val all: Seq[Q] = Seq(chunk, seqPack, cdcChunks)
}
