package graft.operators

import graft.SparkSpec

/** Label propagation must find min-id components on shapes beyond the
  * fixture's planted pairs: a chain (exercises multi-round
  * convergence — one hop per round), a cycle, and isolated nodes. */
class ConnectedComponentsSpec extends SparkSpec {

  test("chain, triangle, and singletons cluster to their min ids") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, singletons 20, 21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("ai", "bi")
    val nodes = (Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L, 21L)).toDF("doc_id")
    val got = DedupOps.connectedComponents(pairs, nodes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 21L)
    assert(got == want)
  }
}
