package graft.queries

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Scale-technique operators: patterns whose *result* is identical to a
  * plain formulation (so the DuckDB oracle is the plain SQL) but whose
  * *plan* demonstrates the 100 TB mechanics.
  */
object ScaleQueries {

  /** Skew-salted join: the fact side gets a deterministic salt
    * (key mod S), the dimension side is replicated S ways, and the join
    * runs on (key, salt) — splitting any hot key's rows across S tasks.
    * Result ≡ the unsalted join, which is exactly what the oracle runs.
    *
    * @note scale: AQE's OptimizeSkewedJoin handles moderate skew
    *   automatically; manual salting is for pathological power-law keys
    *   (one user = 10% of a 100 TB fact table) where even a split
    *   partition's build side overflows. S sizes to ~2× executor count;
    *   the dim replication cost is S× a broadcast-sized table. */
  private val joinSkewSalted = Q(
    "join_skew_salted",
    s"""SELECT o.o_orderpriority, count(*) AS n, ${Det.osum("l.l_extendedprice")} AS revenue
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val S = 8
    val fact = Tables.lineitem(s, d)
      .withColumn("salt", pmod(col("l_orderkey"), lit(S)))
    val dim = Tables.orders(s, d)
      .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
    fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey") && fact("salt") === dim("salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** The SQL-string entry path (SURVEY §3.2-3): one ANSI-portable string
    * registered over temp views and executed by `spark.sql` — the SAME
    * string is the DuckDB oracle, proving dialect-portable SQL runs
    * unchanged on both engines. */
  private val sqlQ3: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
      |                 * (1 - CAST(l_discount AS DECIMAL(28,6)))), 4) AS DOUBLE) AS revenue
      |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private val sqlEntry = Q("sql_entry_q3", sqlQ3) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(sqlQ3)
  }

  /** LATERAL correlated subquery with per-row ORDER BY + LIMIT — the
    * top-2 lineitems of each big order. Exercises Catalyst's lateral
    * decorrelation (the subquery can't run row-at-a-time at scale; the
    * optimizer rewrites it to a joined window rank). Same string runs
    * on DuckDB, which plans it natively. */
  private val sqlLateral: String =
    """SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
      |FROM orders o,
      |LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem l
      |         WHERE l.l_orderkey = o.o_orderkey
      |         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t
      |WHERE o.o_totalprice > 450000
      |ORDER BY o_orderkey, l_extendedprice DESC, l_linenumber""".stripMargin

  private val sqlLateralTopn = Q("sql_lateral_topn", sqlLateral) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(sqlLateral)
  }

  /** TPC-H Q5 shape (local supplier volume): the 6-way snowflake join
    * with the extra `c_nationkey = s_nationkey` co-location condition,
    * a year filter, and one revenue agg per nation. The widest
    * join-reorder / broadcast-pick test in the suite — region and
    * nation must end up broadcast, the orders⋈lineitem backbone
    * shuffle-joined on orderkey. `year()` instead of a timestamp
    * literal keeps one string valid in both dialects (the fixture's
    * dates are TIMESTAMP_NTZ on Spark, §8.2). */
  private val sqlQ5: String =
    """SELECT n_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
      |                 * (1 - CAST(l_discount AS DECIMAL(28,6)))), 4) AS DOUBLE) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name IN ('ASIA', 'EUROPE') AND year(o.o_orderdate) BETWEEN 1995 AND 1997
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  private val sqlTpchQ5 = Q("sql_tpch_q5", sqlQ5) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.region(s, d).createOrReplaceTempView("region")
    s.sql(sqlQ5)
  }

  /** Recursive CTE (Spark 4's UnionLoop): hierarchical rollup over the
    * implicit part taxonomy `parent(k) = floor(k/10)` — every part
    * contributes its price (integer cents, so the additive agg is
    * exact) to all its ancestors, then one grouped agg per node. The
    *  SAME string runs on DuckDB; `floor(x/10.0)` instead of integer
    * `/` keeps one string valid in both dialects (DuckDB's int `/`
    * yields DOUBLE).
    *
    * @note scale: recursion depth is O(log10 maxkey) — each UnionLoop
    *   iteration is a NARROW map over the previous frontier (no
    *   shuffle), and only the final GROUP BY exchanges; 100× more parts
    *   adds two iterations, not two shuffles. The closure's row count
    *   is nodes × depth, linear-ish in the input. */
  private val sqlRecursive: String =
    """WITH RECURSIVE anc AS (
      |  SELECT p_partkey AS pk, p_partkey AS node,
      |         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      |  FROM part
      |  UNION ALL
      |  SELECT pk, CAST(floor(node / 10.0) AS BIGINT) AS node, cents
      |  FROM anc WHERE node >= 1
      |)
      |SELECT node, count(*) AS n_desc, CAST(sum(cents) AS BIGINT) AS subtree_cents
      |FROM anc GROUP BY node ORDER BY node""".stripMargin

  private val sqlRecursiveBom = Q("sql_recursive_bom", sqlRecursive) { (s, d) =>
    Tables.part(s, d).createOrReplaceTempView("part")
    s.sql(sqlRecursive)
  }

  /** Bloom-prefiltered semi-join ([[graft.operators.JoinOps
    * .bloomSemiJoin]]): lineitems of high-value orders. The bloom pass
    * discards non-matching fact rows before the exchange; the exact
    * semi-join scrubs false positives, so the result — and the oracle —
    * is the plain semi-join. */
  private val joinBloomPrefilter = Q(
    "join_bloom_prefilter",
    s"""SELECT l_returnflag, count(*) AS n, ${Det.osum("l_extendedprice")} AS rev
       |FROM lineitem WHERE l_orderkey IN
       |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val dim = Tables.orders(s, d)
      .filter(col("o_totalprice") > 400000).select("o_orderkey")
    graft.operators.JoinOps.bloomSemiJoin(
        Tables.lineitem(s, d), dim, "l_orderkey", "o_orderkey",
        expectedItems = 200000L, fpp = 0.01)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("rev"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q17 shape (small-quantity-order revenue): a correlated
    * scalar AVG subquery per part. Row-at-a-time evaluation is
    * impossible at scale — Catalyst must decorrelate to an aggregated
    * self-join; DuckDB plans it natively the same way. One portable
    * string, exact decimal arithmetic. */
  private val sqlQ17: String =
    """SELECT count(*) AS n_small,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))), 4) AS DOUBLE) AS revenue
      |FROM lineitem l1 JOIN part p ON p.p_partkey = l1.l_partkey
      |WHERE p.p_size <= 10
      |  AND l1.l_quantity < (SELECT 0.4 * avg(CAST(l2.l_quantity AS DECIMAL(28,6)))
      |                       FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin

  private val sqlTpchQ17 = Q("sql_tpch_q17", sqlQ17) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.part(s, d).createOrReplaceTempView("part")
    s.sql(sqlQ17)
  }

  /** Correlated EXISTS / NOT EXISTS in one query — the decorrelation
    * shape behind semi/anti joins when written as predicates: customers
    * WITH an urgent order but WITHOUT any 'F'-status order. */
  private val sqlExists: String =
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |              AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  private val sqlExistsDecorrelate = Q("sql_exists_decorrelate", sqlExists) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(sqlExists)
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT join so
    * zero-order customers survive with n_orders = 0, then the
    * count-of-counts rollup — the double-aggregation distribution query
    * every profiling pass runs. One portable string.
    *
    * @note scale: the left join shuffles both sides on custkey with the
    *   orders side pre-aggregated map-side; the second agg groups on the
    *   tiny distinct-count domain, so it's a near-free exchange. */
  private val sqlQ13: String =
    """SELECT n_orders, count(*) AS n_cust
      |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      |      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |      GROUP BY c.c_custkey) t
      |GROUP BY n_orders ORDER BY n_orders""".stripMargin

  private val sqlTpchQ13 = Q("sql_tpch_q13", sqlQ13) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(sqlQ13)
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the heaviest
    * decorrelation stress in the suite — a 4-table join with BOTH a
    * correlated EXISTS (another supplier contributed to the order) and
    * a correlated NOT EXISTS (no OTHER supplier's line was flagged)
    * against the same fact table. The fixture's trimmed lineitem has no
    * receipt/commit dates, so `l_returnflag = 'R'` stands in for "late
    * line" — the plan shape (semi + anti self-joins on l_orderkey, dims
    * broadcast) is the real Q21.
    *
    * @note scale: Catalyst rewrites both predicates to one semi and one
    *   anti join shuffled on l_orderkey — three passes over the fact
    *   share a partitioning; supplier/nation broadcast. No correlated
    *   per-row subquery survives (that would be a 100 TB disaster). */
  private val sqlQ21: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND s_nationkey = n_nationkey
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  private val sqlTpchQ21 = Q("sql_tpch_q21", sqlQ21) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    s.sql(sqlQ21)
  }

  /** TPC-H Q4 shape (order priority checking): EXISTS over the fact
    * table with a correlated date comparison — the fixture has no
    * commit/receipt dates, so "a line shipped >30 days after ordering"
    * stands in for "commit missed". Catalyst must decorrelate to a
    * semi-join on l_orderkey; the date arithmetic rides inside the
    * join condition, not a per-row subquery. */
  private val sqlQ4: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE year(o.o_orderdate) BETWEEN 1996 AND 1997
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private val sqlTpchQ4 = Q("sql_tpch_q4", sqlQ4) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(sqlQ4)
  }

  /** TPC-H Q12 shape (shipping-priority classification): one
    * orders⋈lineitem join with BOTH branches of a conditional count in
    * a single pass (high- vs low-priority lines among late shippers) —
    * the multi-metric CASE-agg every ops dashboard runs. l_returnflag
    * stands in for l_shipmode (fixture has no ship mode). BIGINT casts
    * keep DuckDB's HUGEINT sums out of the schema compare. */
  private val sqlQ12: String =
    """SELECT l.l_returnflag AS ship_class,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |  AND year(l.l_shipdate) BETWEEN 1996 AND 1998
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin

  private val sqlTpchQ12 = Q("sql_tpch_q12", sqlQ12) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(sqlQ12)
  }

  /** TPC-H Q14 shape (promo revenue percent): a whole-table scalar
    * ratio of two conditional decimal sums over one month of
    * lineitem⋈part. Numerator and denominator are emitted alongside
    * the percentage so the hash compare pins the exact decimal sums,
    * not just the divided double. */
  private val sqlQ14: String =
    """SELECT
      |  CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(28,6))
      |             * (1 - CAST(l_discount AS DECIMAL(28,6))) ELSE 0 END), 4)
      |    AS DOUBLE) AS promo_revenue,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
      |             * (1 - CAST(l_discount AS DECIMAL(28,6)))), 4)
      |    AS DOUBLE) AS total_revenue,
      |  CAST(round(100.0
      |      * CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
      |            THEN CAST(l_extendedprice AS DECIMAL(28,6))
      |                 * (1 - CAST(l_discount AS DECIMAL(28,6))) ELSE 0 END), 4) AS DOUBLE)
      |      / CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
      |                 * (1 - CAST(l_discount AS DECIMAL(28,6)))), 4) AS DOUBLE), 2)
      |    AS DOUBLE) AS promo_pct
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE year(l.l_shipdate) = 1997 AND month(l.l_shipdate) = 6""".stripMargin

  private val sqlTpchQ14 = Q("sql_tpch_q14", sqlQ14) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.part(s, d).createOrReplaceTempView("part")
    s.sql(sqlQ14)
  }

  /** TPC-H Q18 shape (large-volume customers): IN over a grouped
    * HAVING subquery on the fact table, then the 3-way join back and a
    * re-aggregation — the "find the whales, then explain them" pattern.
    * Catalyst turns the IN into a semi-join against the pre-aggregated
    * fact; both aggs shuffle on orderkey so AQE can reuse the exchange.
    * Unique (qty DESC, orderkey) sort makes the LIMIT deterministic. */
  private val sqlQ18: String =
    """SELECT c.c_name, o.o_orderkey,
      |  CAST(sum(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                       GROUP BY l_orderkey
      |                       HAVING sum(CAST(l_quantity AS DECIMAL(28,6))) > 300)
      |GROUP BY c.c_name, o.o_orderkey
      |ORDER BY total_qty DESC, o.o_orderkey LIMIT 100""".stripMargin

  private val sqlTpchQ18 = Q("sql_tpch_q18", sqlQ18) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(sqlQ18)
  }

  /** TPC-H Q22 shape (global sales opportunity): an aggregated scalar
    * subquery feeding a predicate PLUS a NOT EXISTS anti-join in the
    * same query. The classic `bal > avg(bal)` comparison is restated as
    * the exact cross-multiplied `bal * n > total` so both engines
    * compare decimals, never a dialect-dependent avg() result type
    * (DuckDB's avg(DECIMAL) is DOUBLE, Spark's is DECIMAL — a tie on
    * the boundary would hash-diverge). "No urgent order" replaces "no
    * order" because every fixture customer has orders. */
  private val sqlQ22: String =
    """WITH pos AS (SELECT count(*) AS n_pos,
      |                    sum(CAST(c_acctbal AS DECIMAL(28,6))) AS total_pos
      |             FROM customer WHERE c_acctbal > 0)
      |SELECT c.c_mktsegment, count(*) AS numcust,
      |  CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(28,6))), 4) AS DOUBLE) AS totacctbal
      |FROM customer c, pos
      |WHERE CAST(c.c_acctbal AS DECIMAL(28,6)) * pos.n_pos > pos.total_pos
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  private val sqlTpchQ22 = Q("sql_tpch_q22", sqlQ22) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(sqlQ22)
  }

  /** TPC-H Q3 (shipping priority, the real date-banded form — the
    * earlier `sql_entry_q3` key is the priority-grouped variant): top-10
    * unshipped-revenue orders at the cutoff. Both date predicates must
    * reach their scans; the LIMIT rides a TakeOrderedAndProject over
    * the grouped revenue. Unique (revenue DESC, orderkey) sort keeps
    * the LIMIT deterministic. */
  private val sqlQ3True: String =
    """SELECT l.l_orderkey,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
      |                 * (1 - CAST(l_discount AS DECIMAL(28,6)))), 4) AS DOUBLE) AS revenue,
      |  CAST(o.o_orderdate AS STRING) AS orderdate
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l.l_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin

  private val sqlTpchQ3 = Q("sql_tpch_q3", sqlQ3True) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(sqlQ3True)
  }

  /** TPC-H Q6 (forecasting revenue change): the purest
    * filter-then-global-agg — every predicate must show in
    * `PushedFilters`, no exchange beyond the 1-row final agg merge. */
  private val sqlQ6: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
      |                 * CAST(l_discount AS DECIMAL(28,6))), 4) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE year(l_shipdate) = 1997
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  private val sqlTpchQ6 = Q("sql_tpch_q6", sqlQ6) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(sqlQ6)
  }

  /** TPC-H Q10 (returned-item reporting): the 4-way join funnel into a
    * wide group-by (customer identity) with a top-20 on aggregated
    * revenue — the "who cost us the most" report. Nation broadcasts;
    * orders⋈lineitem shuffles on orderkey then regroups on custkey. */
  private val sqlQ10: String =
    """SELECT c.c_custkey, c.c_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
      |                 * (1 - CAST(l_discount AS DECIMAL(28,6)))), 4) AS DOUBLE) AS revenue,
      |  n.n_name
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R' AND year(o.o_orderdate) = 1997
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin

  private val sqlTpchQ10 = Q("sql_tpch_q10", sqlQ10) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    s.sql(sqlQ10)
  }

  // ------------------------------------------------------------------
  // r5: the remaining TPC-H shapes, completing the 22-query family.
  // The fixture schema has no partsupp table and no l_commitdate /
  // l_receiptdate / p_container columns, so the partsupp-dependent
  // queries (Q2/Q11/Q16/Q20, Q9's supplycost term) are re-anchored on a
  // lineitem-derived supplier×part relation — every JOIN/SUBQUERY SHAPE
  // of the original is preserved (correlated min, scalar-subquery
  // threshold, NOT IN anti, nested IN + correlated HAVING), which is
  // what the planner-behavior coverage is for. Q1's canonical form has
  // been `agg_pricing_summary` since r1.

  /** TPC-H Q7 (volume shipping): the bidirectional nation-pair filter
    * — one OR of two AND arms — over the 6-way join, grouped by the
    * (supplier nation, customer nation, year) triple.
    *
    * @note scale: both nation dims broadcast; the orders⋈lineitem
    *   backbone shuffles once on orderkey and the regroup is on the
    *   tiny triple key. The OR predicate sits above the joins (it
    *   references both sides) — what must push down is each arm's
    *   nation IN-list into the two nation scans, which Catalyst derives
    *   as `n_name IN (A,B)` on each side. */
  private val sqlQ7: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(round(sum(volume),4) AS DOUBLE) AS revenue
      |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |        year(l.l_shipdate) AS l_year,
      |        CAST(l_extendedprice AS DECIMAL(28,6))
      |          * (1 - CAST(l_discount AS DECIMAL(28,6))) AS volume
      |      FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      |      JOIN orders o ON o.o_orderkey = l.l_orderkey
      |      JOIN customer c ON c.c_custkey = o.o_custkey
      |      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      |      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      |      WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3')
      |          OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2'))
      |        AND year(l.l_shipdate) BETWEEN 1996 AND 1998) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  private val sqlTpchQ7 = Q("sql_tpch_q7", sqlQ7) { (s, d) =>
    Seq("supplier", "lineitem", "orders", "customer", "nation")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlQ7)
  }

  /** TPC-H Q8 (national market share): a ratio-of-sums over the widest
    * join in the suite (7 tables, nation joined TWICE under different
    * roles). The share divides two exact decimal sums as doubles —
    * deterministic because both operands are exact before the one
    * IEEE division.
    *
    * @note scale: part is the selective anchor (`p_type` filter prunes
    *   ~5/6 of the fact rows via the partkey join); region/nation
    *   broadcast twice under different aliases — Catalyst dedups the
    *   scan, not the exchange, which is the right trade. */
  private val sqlQ8: String =
    """SELECT o_year,
      |  CAST(round(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume
      |                           ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
      |        / CAST(sum(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
      |FROM (SELECT year(o.o_orderdate) AS o_year,
      |        CAST(l_extendedprice AS DECIMAL(28,6))
      |          * (1 - CAST(l_discount AS DECIMAL(28,6))) AS volume,
      |        n2.n_name AS nation
      |      FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
      |      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |      JOIN orders o ON o.o_orderkey = l.l_orderkey
      |      JOIN customer c ON c.c_custkey = o.o_custkey
      |      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      |      JOIN region r ON n1.n_regionkey = r.r_regionkey
      |      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      |      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
      |        AND year(o.o_orderdate) BETWEEN 1995 AND 1998) all_nations
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  private val sqlTpchQ8 = Q("sql_tpch_q8", sqlQ8) { (s, d) =>
    Seq("part", "lineitem", "supplier", "orders", "customer", "nation", "region")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlQ8)
  }

  /** TPC-H Q9 (product-type profit, supplycost term dropped with the
    * partsupp table): LIKE-filtered part anchor, profit grouped by
    * (supplier nation, order year) with the canonical `o_year DESC`
    * inner sort. */
  private val sqlQ9: String =
    """SELECT nation, o_year, CAST(round(sum(amount),4) AS DOUBLE) AS sum_profit
      |FROM (SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
      |        CAST(l_extendedprice AS DECIMAL(28,6))
      |          * (1 - CAST(l_discount AS DECIMAL(28,6))) AS amount
      |      FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
      |      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |      JOIN orders o ON o.o_orderkey = l.l_orderkey
      |      JOIN nation n ON s.s_nationkey = n.n_nationkey
      |      WHERE p.p_name LIKE '%bolt%') profit
      |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin

  private val sqlTpchQ9 = Q("sql_tpch_q9", sqlQ9) { (s, d) =>
    Seq("part", "lineitem", "supplier", "orders", "nation")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlQ9)
  }

  /** TPC-H Q2 (minimum-cost supplier): the correlated-scalar-subquery
    * classic — for each part, keep only suppliers matching the REGIONAL
    * minimum cost, where the partsupp cost relation is derived from
    * lineitem (`min(l_extendedprice)` per supplier×part — exact double
    * min, no arithmetic, so both engines agree bit-for-bit).
    *
    * @note scale: Catalyst decorrelates the subquery into a grouped
    *   min over the same derived relation joined back on partkey — two
    *   aggregations over one shuffled relation, not a per-row probe.
    *   The derived `ps` CTE is referenced twice; at 100 TB you persist
    *   it (or bucket it by partkey) instead of recomputing. */
  private val sqlQ2: String =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(l_extendedprice) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
      |FROM part p JOIN ps ON p.p_partkey = ps.ps_partkey
      |JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE p.p_size <= 15 AND r.r_name = 'EUROPE'
      |  AND ps.ps_supplycost = (SELECT min(ps2.ps_supplycost)
      |                          FROM ps ps2
      |                          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      |                          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |                          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |                          WHERE ps2.ps_partkey = p.p_partkey
      |                            AND r2.r_name = 'EUROPE')
      |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
      |LIMIT 100""".stripMargin

  private val sqlTpchQ2 = Q("sql_tpch_q2", sqlQ2) { (s, d) =>
    Seq("lineitem", "part", "supplier", "nation", "region")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlQ2)
  }

  /** TPC-H Q11 (important stock): grouped value per part (suppliers
    * from a nation subset) kept only above a global-total threshold —
    * the scalar-subquery-in-WHERE shape. Restated cross-multiplied
    * (`value * 1000 > total`) so both sides stay EXACT decimals; a
    * `value > total * 0.001` form would compare against a dialect-
    * dependent decimal×double product (the Q22 lesson). The per-part
    * sum is capped back to DECIMAL(28,6) (22 integer digits — far
    * above any real per-part value even at 100 TB) so the ×1000
    * product types at DECIMAL(33,6) ≤ 38 and can never hit the
    * precision ceiling that would null the filter under non-ANSI
    * decimal arithmetic.
    *
    * @note scale: two aggregations over the same shuffled relation —
    *   Catalyst plans the scalar subquery as a one-row broadcast into
    *   the filter, so the threshold costs one extra reduce, not a
    *   second scan of lineitem (the CTE is shared). */
  private val sqlQ11: String =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
      |              AS DECIMAL(28,6)) AS value_dec
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  WHERE n.n_name IN ('NATION_3', 'NATION_7')
      |  GROUP BY l_partkey)
      |SELECT ps_partkey, CAST(round(value_dec, 4) AS DOUBLE) AS value
      |FROM ps WHERE value_dec * 1000 > (SELECT sum(value_dec) FROM ps)
      |ORDER BY value DESC, ps_partkey""".stripMargin

  private val sqlTpchQ11 = Q("sql_tpch_q11", sqlQ11) { (s, d) =>
    Seq("lineitem", "supplier", "nation")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlQ11)
  }

  /** TPC-H Q15 (top supplier): quarter-windowed per-supplier revenue
    * equi-filtered against its own max — the view-plus-max-subquery
    * shape. Exact decimal revenue makes the `=` comparison safe on
    * both engines (a double sum would make ties engine-dependent). */
  private val sqlQ15: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(CAST(l_extendedprice AS DECIMAL(28,6))
      |             * (1 - CAST(l_discount AS DECIMAL(28,6)))) AS total_rev
      |  FROM lineitem
      |  WHERE year(l_shipdate) = 1996 AND quarter(l_shipdate) = 1
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name,
      |       CAST(round(r.total_rev, 4) AS DOUBLE) AS total_revenue
      |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
      |WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
      |ORDER BY s.s_suppkey""".stripMargin

  private val sqlTpchQ15 = Q("sql_tpch_q15", sqlQ15) { (s, d) =>
    Seq("lineitem", "supplier")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlQ15)
  }

  /** TPC-H Q16 (parts/supplier relationship): distinct-supplier counts
    * per part attribute triple with a `NOT IN` subquery — Spark plans
    * the null-aware anti join (s_suppkey is non-null, so it degrades to
    * a plain anti); the supplier×part relation derives from lineitem. */
  private val sqlQ16: String =
    """WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
      |                            l_suppkey AS ps_suppkey FROM lineitem)
      |SELECT p.p_brand, p.p_type, p.p_size,
      |       count(DISTINCT ps.ps_suppkey) AS supplier_cnt
      |FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
      |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      |  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                            WHERE s_acctbal < 0)
      |GROUP BY p.p_brand, p.p_type, p.p_size
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin

  private val sqlTpchQ16 = Q("sql_tpch_q16", sqlQ16) { (s, d) =>
    Seq("lineitem", "part", "supplier")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlQ16)
  }

  /** TPC-H Q19 (discounted revenue): the OR-of-conjunctions predicate
    * — three brand/size/quantity arms across two tables. The join-key
    * IsNotNull and the derivable `p_size BETWEEN 1 AND 25` envelope
    * push to the scans; the residual OR evaluates post-join in one
    * codegen stage. Global agg ⇒ one row, no grouping shuffle. */
  private val sqlQ19: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
      |                 * (1 - CAST(l_discount AS DECIMAL(28,6)))), 4) AS DOUBLE) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand IN ('Brand#1','Brand#2','Brand#3')
      |       AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
      |   OR (p.p_brand IN ('Brand#4','Brand#5')
      |       AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 30)""".stripMargin

  private val sqlTpchQ19 = Q("sql_tpch_q19", sqlQ19) { (s, d) =>
    Seq("lineitem", "part").foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlQ19)
  }

  /** TPC-H Q20 (potential part promotion): the deepest nesting in the
    * suite — an IN whose subquery GROUPs and keeps supplier×part cells
    * via a HAVING against a CORRELATED scalar subquery (this cell's
    * share of the part's total quantity ≥ 50%, cross-multiplied to
    * stay in exact decimals), inside which an uncorrelated IN prunes
    * to LIKE-matched parts.
    *
    * @note scale: Catalyst decorrelates the HAVING subquery to a
    *   grouped-total join on partkey — so the whole pyramid flattens
    *   to two aggregations + two semi joins over one lineitem scan
    *   each; nothing is per-row. */
  private val sqlQ20: String =
    """SELECT s.s_suppkey, s.s_name, n.n_name
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE s.s_acctbal > 0
      |  AND s.s_suppkey IN (
      |    SELECT l.l_suppkey FROM lineitem l
      |    WHERE l.l_partkey IN (SELECT p_partkey FROM part
      |                          WHERE p_name LIKE 'red%')
      |      AND year(l.l_shipdate) BETWEEN 1996 AND 1998
      |    GROUP BY l.l_suppkey, l.l_partkey
      |    HAVING sum(CAST(l.l_quantity AS DECIMAL(18,6))) * 5 >
      |      (SELECT sum(CAST(l2.l_quantity AS DECIMAL(18,6)))
      |       FROM lineitem l2
      |       WHERE l2.l_partkey = l.l_partkey
      |         AND year(l2.l_shipdate) BETWEEN 1996 AND 1998))
      |ORDER BY s.s_suppkey""".stripMargin

  private val sqlTpchQ20 = Q("sql_tpch_q20", sqlQ20) { (s, d) =>
    Seq("supplier", "nation", "lineitem", "part")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlQ20)
  }

  val all: Seq[Q] = Seq(joinSkewSalted, sqlEntry, sqlLateralTopn, sqlTpchQ5,
    sqlRecursiveBom, joinBloomPrefilter, sqlTpchQ17, sqlExistsDecorrelate,
    sqlTpchQ13, sqlTpchQ21, sqlTpchQ4, sqlTpchQ12, sqlTpchQ14, sqlTpchQ18,
    sqlTpchQ22, sqlTpchQ3, sqlTpchQ6, sqlTpchQ10, sqlTpchQ2, sqlTpchQ7,
    sqlTpchQ8, sqlTpchQ9, sqlTpchQ11, sqlTpchQ15, sqlTpchQ16, sqlTpchQ19,
    sqlTpchQ20)
}
