package graft.queries

import graft.{Q, Tables}
import graft.operators.{GraphOps, TextOps}
import org.apache.spark.sql.functions.col

/** Iterative graph analytics keys. The fixture graph is the distinct
  * token co-occurrence (consecutive-bigram) digraph of `documents` —
  * small vocabulary, but the plan shape (join + agg per iteration) is
  * the same one a web-scale hyperlink graph runs.
  *
  * The oracle unrolls the same integer-arithmetic power iteration as
  * chained CTEs; because [[GraphOps.pagerank]] is all 64-bit integer
  * math, the match is exact (no float summation order anywhere).
  */
object GraphQueries {

  private val iters = 3

  /** One oracle-side iteration: rank flows along `big` edges, damped
    * 85%, with the teleport base added back. Mirrors the Spark loop
    * body in [[GraphOps.pagerank]] token for token. */
  private def iterCte(k: Int): String = {
    val prev = if (k == 1) "r0" else s"i${k - 1}"
    s"""i$k AS (
       |  SELECT nd.node, (150000000000 // nn.n) + coalesce(c.in_r, 0) AS r
       |  FROM nodes nd CROSS JOIN nn
       |  LEFT JOIN (SELECT b.dst AS node,
       |               CAST(sum(((p.r // o.outdeg) * 85) // 100) AS BIGINT) AS in_r
       |             FROM big b JOIN $prev p ON p.node = b.src
       |                        JOIN outdeg o ON o.src = b.src
       |             GROUP BY 1) c USING (node))""".stripMargin
  }

  private val pagerank = Q(
    "graph_pagerank",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |big AS (SELECT DISTINCT t[i+1] AS src, t[i+2] AS dst
       |        FROM toks, unnest(range(len(t) - 1)) AS u(i) WHERE len(t) >= 2),
       |nodes AS (SELECT src AS node FROM big UNION SELECT dst FROM big),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM big GROUP BY 1),
       |r0 AS (SELECT node, 1000000000000 // nn.n AS r FROM nodes CROSS JOIN nn),
       |${(1 to iters).map(iterCte).mkString(",\n")}
       |SELECT node, r FROM i$iters ORDER BY node""".stripMargin) { (s, d) =>
    val edges = TextOps.bigrams(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("w1").as("src"), col("w2").as("dst")).distinct()
    GraphOps.pagerank(edges, iters).orderBy("node")
  }

  /** Triangle census ([[GraphOps.triangleStats]]) of the undirected
    * co-occurrence graph — the clustering-structure probe next to
    * PageRank's centrality. Counts are integers, so the oracle match
    * is exact. */
  private val triangles = Q(
    "graph_triangles",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |big AS (SELECT DISTINCT t[i+1] AS src, t[i+2] AS dst
      |        FROM toks, unnest(range(len(t) - 1)) AS u(i) WHERE len(t) >= 2),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM big WHERE src <> dst),
      |nn AS (SELECT count(*) AS n_nodes
      |       FROM (SELECT a AS n FROM und UNION SELECT b FROM und)),
      |ne AS (SELECT count(*) AS n_edges FROM und),
      |nt AS (SELECT count(*) AS n_triangles
      |       FROM und e1 JOIN und e2 ON e2.a = e1.b
      |            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT n_nodes, n_edges, n_triangles FROM nn, ne, nt""".stripMargin) { (s, d) =>
    val edges = TextOps.bigrams(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("w1").as("src"), col("w2").as("dst")).distinct()
    GraphOps.triangleStats(edges)
  }

  /** One oracle-side LPA round: per (node, neighbor-label) counts,
    * then top-1 by (count DESC, label ASC) — mirrors the Spark loop
    * body in [[GraphOps.labelPropagation]]. */
  private def lpaCte(k: Int): String = {
    val prev = if (k == 1) "l0" else s"l${k - 1}"
    s"""l$k AS (
       |  SELECT node, lbl FROM (
       |    SELECT u AS node, lbl, cnt,
       |           row_number() OVER (PARTITION BY u
       |                              ORDER BY cnt DESC, lbl) AS rn
       |    FROM (SELECT s.u, p.lbl, count(*) AS cnt
       |          FROM sym s JOIN $prev p ON p.node = s.v
       |          GROUP BY 1, 2))
       |  WHERE rn = 1)""".stripMargin
  }

  /** Community detection via deterministic synchronous label
    * propagation ([[GraphOps.labelPropagation]]) over the token
    * co-occurrence graph — the third [[GraphOps.iterate]]-based key
    * (after PageRank and the dedup connected components), and the one
    * whose per-round update is a windowed top-1, not a sum. Labels are
    * token strings, counts are integers, the tie-break is total — so
    * the oracle match is exact. */
  private val labelProp = Q(
    "graph_label_prop",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |big AS (SELECT DISTINCT t[i+1] AS src, t[i+2] AS dst
       |        FROM toks, unnest(range(len(t) - 1)) AS u(i) WHERE len(t) >= 2),
       |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |        FROM big WHERE src <> dst),
       |sym AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
       |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM sym),
       |${(1 to iters).map(lpaCte).mkString(",\n")}
       |SELECT node, lbl FROM l$iters ORDER BY node""".stripMargin) { (s, d) =>
    val edges = TextOps.bigrams(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("w1").as("src"), col("w2").as("dst")).distinct()
    GraphOps.labelPropagation(edges, iters).orderBy("node")
  }

  /** Flink `DataStream#iterate` — the item every prior round's gap
    * list called an ENGINE CEILING — realized on the streaming runtime
    * via [[graft.streaming.FeedbackIterate]]: a foreachBatch sink
    * writing its emissions back into its own file source forms the
    * iteration edge, and micro-batch boundaries are the synchronous
    * BSP round barriers. Three message-passing LPA rounds run as
    * three cyclic micro-batches, final labels drained from the
    * checkpoint state — hash-matching [[labelProp]]'s own unrolled
    * oracle, so the cyclic construction is certified equal to the
    * batch iterate loop. */
  private val streamIterateLpa = Q(
    "stream_iterate_lpa", labelProp.oracle.get) { (s, d) =>
    val edges = TextOps.bigrams(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("w1").as("src"), col("w2").as("dst")).distinct()
    graft.streaming.FeedbackIterate.labelPropagation(s, edges, iters)
      .orderBy("node")
  }

  /** Flink `iterateDelta` on the streaming runtime
    * ([[graft.streaming.FeedbackIterate.connectedComponents]]): a node
    * re-broadcasts its minimum label only when it CHANGES, so the
    * cyclic message volume decays and the loop drains itself at the
    * exact fixpoint — no round bound chosen in advance, exact
    * components at any graph diameter. Gated against a full
    * recursive-CTE transitive closure, so the quiescence-terminated
    * cycle is certified equal to true connected components (not an
    * iteration-bounded approximation). */
  private val streamIterateCc = Q(
    "stream_iterate_cc",
    """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |big AS (SELECT DISTINCT t[i+1] AS src, t[i+2] AS dst
      |        FROM toks, unnest(range(len(t) - 1)) AS u(i) WHERE len(t) >= 2),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM big WHERE src <> dst),
      |sym AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
      |reach(s, t) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      |  UNION
      |  SELECT r.s, e.v FROM reach r JOIN sym e ON r.t = e.u)
      |SELECT s AS node, min(t) AS comp FROM reach GROUP BY 1
      |ORDER BY node""".stripMargin) { (s, d) =>
    val edges = TextOps.bigrams(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("w1").as("src"), col("w2").as("dst")).distinct()
    graft.streaming.FeedbackIterate.connectedComponents(s, edges)
      .orderBy("node")
  }

  val all: Seq[Q] = Seq(pagerank, triangles, labelProp, streamIterateLpa,
    streamIterateCc)
}
