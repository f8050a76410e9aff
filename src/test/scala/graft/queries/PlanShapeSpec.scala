package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-shape regression gate: the properties the plan audit verified
  * by hand (SCALE.md) asserted as tests, so a future change that
  * silently degrades a plan (lost pushdown, surprise cartesian, dropped
  * broadcast) fails here instead of only showing up in bench numbers.
  * Planning only — nothing executes.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan.toString

  // Keys ALLOWED to plan a BroadcastNestedLoopJoin: each was audited
  // (PLANS.md) and broadcasts a deliberately tiny side — query vectors,
  // sketch/quantile grid tables, one-row scalar aggregates, the
  // documented small cross joins. A BNLJ appearing anywhere else is a
  // plan regression (an equi-join that lost its keys, or an
  // accidental all-pairs), which this census turns into a test failure
  // instead of a silent bench cliff.
  private val bnljAllowed = Set(
    "agg_cms_meanmin", "agg_gap_fill", "agg_kmv_retention",
    "agg_kmv_setops", "agg_theta_retention", "agg_topk_portable",
    "graph_triangles", "join_cross_small", "join_theta",
    "llm_dedup_embcell", "llm_domain_mix", "llm_edit_join_exact",
    "llm_edit_join_long", "llm_hybrid_rrf", "llm_knn_cosine",
    "llm_knn_ivf_det", "llm_knn_ivfpq_det",
    "llm_knn_ivfsq8_det", "llm_knn_sq8", "llm_lm_heldout",
    "llm_lm_score", "llm_sample_temperature", "llm_tfidf_top",
    "profile_skew", "sql_tpch_q22", "stream_topk_window_portable")
  // r15 removed llm_knn_ivf_saved + the three ANN maintenance replays:
  // the probe-once serve builds its broadcast side as a LocalRelation,
  // so their serve joins plan BroadcastHashJoin now — a BNLJ returning
  // there is once again a regression this census catches.

  test("global plan census: zero cartesian products; BNLJ only in the audited small-broadcast allowlist") {
    val cartesian = Seq.newBuilder[String]
    val bnljRogue = Seq.newBuilder[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { k =>
      val p = plan(k)
      if (p.contains("CartesianProduct")) cartesian += k
      if (p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(k))
        bnljRogue += k
    }
    assert(cartesian.result().isEmpty,
      s"cartesian products in: ${cartesian.result()}")
    assert(bnljRogue.result().isEmpty,
      s"BNLJ outside the audited allowlist in: ${bnljRogue.result()} — " +
        "either a plan regression or a new key that needs auditing " +
        "(PLANS.md) before joining bnljAllowed")
  }

  test("compound predicates reach the parquet scan") {
    // plan toString truncates long filter lists — assert on the head
    val p = plan("filter_compound")
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice)"), p)
  }

  test("global top-k avoids a global sort") {
    assert(plan("topk_global").contains("TakeOrderedAndProject"))
  }

  test("pinned dimension broadcast survives") {
    assert(plan("join_broadcast_dim").contains("BroadcastHashJoin"))
  }

  test("shingle self-join stays a shuffled hash join") {
    assert(plan("llm_dedup_ngram").contains("ShuffledHashJoin"))
  }

  test("native as-of join plans the custom operator with co-partitioned sorts") {
    val p = plan("join_asof_native")
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "the as-of node must not fall back to a standard join")
  }

  test("kNN family ranks via partial top-k aggregate, not a window shuffle") {
    // the exchange above the score stage must carry partition-local
    // top-k buffers (ObjectHashAggregate partial), never the full
    // scored pair set ranked by row_number
    for (k <- Seq("llm_knn_cosine", "llm_knn_sq8", "llm_knn_ivf",
        "llm_knn_pq", "llm_knn_ivfsq8")) {
      val p = plan(k)
      assert(!p.contains("Window"), s"$k still ranks through a window:\n$p")
      assert(p.contains("ObjectHashAggregate"), s"$k lacks the partial top-k:\n$p")
    }
  }

  test("aggregations run two-phase (partial then final)") {
    val p = plan("agg_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("SCD2 and interval ops shuffle their key ONCE (windows share the exchange)") {
    for (k <- Seq("cdc_scd2", "state_merge_intervals", "state_session_ids")) {
      val n = "Exchange hashpartitioning".r.findAllIn(plan(k)).size
      assert(n == 1, s"$k: expected 1 hash exchange, got $n")
    }
  }

  test("recursive CTE plans Spark 4's UnionLoop, not a blowup") {
    assert(plan("sql_recursive_bom").contains("UnionLoop"))
  }

  test("bloom prefilter pushes the dim predicate to its scan") {
    val p = plan("join_bloom_prefilter")
    assert(p.contains("GreaterThan(o_totalprice,400000.0)"), p)
  }

  test("stream-static enrichment broadcasts the dimension side") {
    assert(plan("stream_enrich_static").contains("BroadcastHashJoin"))
  }

  test("boilerplate ratio broadcasts the hot-gram table back-join") {
    assert(plan("llm_boilerplate_ratio").contains("BroadcastHashJoin"))
  }

  test("Q13 keeps the zero-preserving join LEFT outer after optimization") {
    val p = plan("sql_tpch_q13")
    assert(p.contains("LeftOuter"), p)
  }

  // ---- gates for the most expensive bench keys (BENCH_FULL.json top) ----

  test("tfidf: df side broadcast, top-k group-limited, exactly one intended BNLJ") {
    val p = plan("llm_tfidf_top")
    assert(p.contains("BroadcastHashJoin"), "df table must broadcast")
    assert(p.contains("WindowGroupLimit"),
      "per-term top-k must prune below the final sort")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1,
      "exactly the one-row doc-count BNLJ is allowed")
  }

  test("projection keys shuffle ONLY for the mandated output sort") {
    // scalar_math / proj_compute / scalar_map are narrow projections —
    // any hash exchange would mean an accidental aggregation/join
    for (k <- Seq("scalar_math", "proj_compute", "scalar_map")) {
      val p = plan(k)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$k: projection must not hash-shuffle")
      // WholeStageCodegen spans only materialize in the AQE final plan,
      // so the codegen property is pinned structurally instead: nothing
      // but scan→project→(sort) may appear
      assert(!p.contains("Join") && !p.contains("Aggregate"),
        s"$k: projection must stay scan→project→sort")
    }
  }

  test("salted skew join stays a shuffled join over the salted key") {
    val p = plan("join_skew_salted")
    assert(p.contains("Exchange hashpartitioning"),
      "salting only helps a shuffled join")
    assert(p.toLowerCase.contains("salt"), "salt column must survive planning")
  }

  test("forward-fill scaffold reuses the user_id partitioning (≤3 exchanges)") {
    val n = "Exchange hashpartitioning".r.findAllIn(plan("state_forward_fill")).size
    assert(n <= 3, s"expected ≤3 hash exchanges, got $n")
  }

  test("approx distinct aggregates two-phase like the exact twin") {
    val p = plan("agg_approx_distinct")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Exchange rangepartitioning") ||
      p.contains("Sort"), "only the output sort may range-shuffle")
  }

  test("Q21 decorrelates both subqueries: one semi, one anti, no per-row subquery") {
    val p = plan("sql_tpch_q21")
    assert(p.contains("LeftSemi"), "EXISTS must become a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must become an anti join")
  }

  test("key-skew report takes top-k without a global sort of all keys") {
    assert(plan("profile_skew").contains("TakeOrderedAndProject"))
  }

  test("skew monitor is a single windowed aggregation (one hash exchange)") {
    val n = "Exchange hashpartitioning".r.findAllIn(plan("stream_skew_monitor")).size
    assert(n == 1, s"expected 1 hash exchange, got $n")
  }

  test("banded MinHash-LSH path plans only equi-joins, never all-pairs") {
    // at fixture scale AQE may broadcast the small verify sides — fine;
    // the invariant worth pinning is that every join stays an EQUI-join
    // (band-value / doc_id keys), so no theta/all-pairs shape can sneak
    // into the LSH path at any scale
    val p = plan("llm_dedup_fuzzy")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "no all-pairs fallback in the LSH path")
    assert(p.contains("Join"), "the candidate/verify joins must be present")
  }

  test("temporal table join broadcasts the versioned dim") {
    assert(plan("stream_temporal_join").contains("BroadcastHashJoin"))
  }

  test("CUMULATE window aggregates in one hash exchange") {
    val n = "Exchange hashpartitioning".r.findAllIn(plan("stream_cumulate")).size
    assert(n == 1, s"expected 1 hash exchange, got $n")
  }

  test("times(n) quantifier is one keyed window pass, no self-join") {
    val p = plan("cep_times")
    assert(!p.contains("Join"), "consecutive times(n) must not self-join")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 1, s"expected 1 hash exchange, got $n")
  }

  test("Q4/Q18 IN-and-EXISTS subqueries decorrelate to semi joins") {
    for (k <- Seq("sql_tpch_q4", "sql_tpch_q18"))
      assert(plan(k).contains("LeftSemi"), s"$k: expected a semi join")
  }

  test("Q22 NOT EXISTS decorrelates to an anti join") {
    assert(plan("sql_tpch_q22").contains("LeftAnti"))
  }

  test("window top-N batch twin shares one exchange between agg and rank") {
    // groupBy(ws,user) then rank partitioned by ws: the rank's
    // ws-partitioning is a coarsening of the agg's — a second hash
    // exchange would mean the window failed to reuse it
    val n = "Exchange hashpartitioning".r.findAllIn(plan("stream_window_topn")).size
    assert(n <= 2, s"expected <=2 hash exchanges, got $n")
  }

  test("Q6 pushes every predicate to the lineitem scan") {
    val p = plan("sql_tpch_q6")
    assert(p.contains("PushedFilters:") && p.contains("IsNotNull(l_discount)"), p)
    assert(!p.contains("Join"), "Q6 must not join")
  }
}
