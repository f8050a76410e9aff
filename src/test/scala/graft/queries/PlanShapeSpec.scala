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

  test("no key plans a cartesian product") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { k =>
      plan(k).contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
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
}
