package graft.queries

import graft.{Det, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch relational core (SURVEY.md §2.2–§2.7): projection/filter/flatMap,
  * the full join menagerie, aggregations, OVER-window analytics, sort/limit
  * and set operations — all declarative DataFrame programs so Catalyst owns
  * pushdown, pruning, partial aggregation and join selection.
  *
  * Every query ends in a total ORDER BY with a unique tiebreak and routes
  * additive float aggregates through [[graft.Det]] (SURVEY.md §8.3).
  */
object RelationalQueries {
  import Det._

  // ---------------------------------------------------------------- P: projection / filter / flatMap / route

  private val projCompute = Q(
    "proj_compute",
    s"""SELECT l_orderkey, l_linenumber,
      |  ${od6("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      |  ${od6("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS charged,
      |  l_returnflag || '/' || l_linestatus AS flag
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      d6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
      d6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("charged"),
      concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag")
    ).orderBy("l_orderkey", "l_linenumber")
  }

  private val filterCompound = Q(
    "filter_compound",
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders
      |WHERE o_orderstatus IN ('O','F') AND o_totalprice BETWEEN 50000 AND 200000
      |  AND o_orderpriority LIKE '%URGENT%' AND year(o_orderdate) >= 1996
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .where(col("o_orderstatus").isin("O", "F")
        && col("o_totalprice").between(50000, 200000)
        && col("o_orderpriority").like("%URGENT%")
        && year(col("o_orderdate")) >= 1996)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  private val flatmapExplode = Q(
    "flatmap_explode",
    """SELECT doc_id, t.token FROM documents, unnest(string_split(text, ' ')) AS t(token)
      |ORDER BY doc_id, token""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .orderBy("doc_id", "token")
  }

  /** Flink side-output / OutputTag analogue: one pass tags every row, the
    * same cached frame feeds N sinks. Batch-equivalent: tag + aggregate. */
  private val splitRoute = Q(
    "split_route",
    s"""SELECT CASE WHEN event_type = 'error' THEN 'alerts'
       |            WHEN value > 90 THEN 'hot' ELSE 'normal' END AS route,
       |  count(*) AS cnt, ${osum("value")} AS sum_value
       |FROM events GROUP BY 1 ORDER BY route""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("route",
        when(col("event_type") === "error", "alerts")
          .when(col("value") > 90, "hot")
          .otherwise("normal"))
      .groupBy("route")
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .orderBy("route")
  }

  // ---------------------------------------------------------------- J: joins

  /** 5-way FK chain + aggregate (the BASELINE.md join_5way shape).
    * @note scale: all equi-joins on dense FKs — AQE picks broadcast for
    *   nation/supplier and sort-merge for orders⋈lineitem; at 100 TB the
    *   orders⋈lineitem side benefits from co-bucketing both tables on
    *   orderkey so the shuffle disappears. */
  private val joinInner = Q(
    "join_inner",
    s"""SELECT n_name, count(*) AS cnt,
       |  ${osum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("n_name")
  }

  private val joinOuterLeft = Q(
    "join_outer_left",
    s"""SELECT c_custkey, count(o_orderkey) AS order_cnt,
       |  coalesce(${osum("o_totalprice")}, 0.0) AS total_spent
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("order_cnt"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** Right outer — the J2 variant the left form doesn't exercise:
    * orders RIGHT JOIN customer keeps order-less customers. */
  private val joinOuterRight = Q(
    "join_outer_right",
    s"""SELECT c_custkey, count(o_orderkey) AS order_cnt,
       |  coalesce(${osum("o_totalprice")}, 0.0) AS total_spent
       |FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
       |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"), "right")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("order_cnt"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")
  }

  private val joinOuterFull = Q(
    "join_outer_full",
    """SELECT coalesce(c.k, s.k) AS nationkey,
      |  coalesce(c.ccnt, 0) AS customer_cnt, coalesce(s.scnt, 0) AS supplier_cnt
      |FROM (SELECT c_nationkey AS k, count(*) AS ccnt FROM customer GROUP BY 1) c
      |FULL JOIN (SELECT s_nationkey AS k, count(*) AS scnt FROM supplier
      |           WHERE s_suppkey < 50 GROUP BY 1) s ON c.k = s.k
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("ccnt"))
    val p = Tables.supplier(s, d).where(col("s_suppkey") < 50)
      .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("scnt"))
    c.join(p, col("ck") === col("sk"), "full")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("ccnt"), lit(0L)).as("customer_cnt"),
        coalesce(col("scnt"), lit(0L)).as("supplier_cnt"))
      .orderBy("nationkey")
  }

  private val joinSemi = Q(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).where(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  private val joinAnti = Q(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).where(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** Flink broadcast-state enrichment pattern: pin the dim side with an
    * explicit broadcast hint so the plan is stable across AQE decisions.
    * @note scale: part is O(SF) small relative to lineitem; broadcasting
    *   removes the shuffle of the 100 TB fact side entirely. */
  private val joinBroadcastDim = Q(
    "join_broadcast_dim",
    s"""SELECT p_brand, count(*) AS cnt,
       |  ${osum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  ${osum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"),
        dsum(rev).as("revenue"),
        dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))).as("promo_revenue"))
      .orderBy("p_brand")
  }

  /** Event-time interval join (Flink KeyedStream#intervalJoin): purchase
    * within (click.ts, click.ts + 5 min] for the same user.
    * @note scale: at 100 TB pre-bucket both sides by (user, coarse time
    *   bucket) so the range predicate only runs inside co-partitioned
    *   buckets; here AQE sort-merge on user_id suffices. */
  private val joinInterval = Q(
    "join_interval",
    """SELECT a.event_id AS click_id, b.event_id AS purchase_id
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND a.event_type = 'click' AND b.event_type = 'purchase'
      |  AND epoch_us(b.ts) > epoch_us(a.ts)
      |  AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000
      |ORDER BY click_id, purchase_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val a = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("au"), col("ts").as("ats"))
    val b = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("bu"), col("ts").as("bts"))
    a.join(b, col("au") === col("bu")
        && col("bts") > col("ats")
        && col("bts") <= col("ats") + expr("INTERVAL 5 MINUTE"))
      .select("click_id", "purchase_id")
      .orderBy("click_id", "purchase_id")
  }

  /** TRUE range join — no equi key at all: lineitems shipped inside a
    * 7-day window after each big order's date, any order × any
    * lineitem. Runs through [[graft.operators.RangeJoinOps]]'s bucket
    * grid (week buckets ≈ interval length), which turns the
    * would-be-BNLJ into a hash join on the bucket; the BNLJ twin is the
    * spec cross-check, the DuckDB oracle states the plain range
    * predicate.
    * @note scale: shuffle is |points| + 2·|intervals| rows, no
    *   broadcast — survives both sides growing where the BNLJ needs one
    *   side to stay driver-small. */
  private val joinRangeBucketed = Q(
    "join_range_bucketed",
    s"""SELECT o.o_orderkey AS o_orderkey, count(*) AS n,
       |  ${Det.osum("l.l_quantity")} AS sum_qty
       |FROM orders o JOIN lineitem l
       |  ON l.l_shipdate >= o.o_orderdate
       |  AND l.l_shipdate < o.o_orderdate + INTERVAL 2 DAY
       |WHERE o.o_totalprice > 480000
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val win = 2L * 86400
    val secs = (c: org.apache.spark.sql.Column) => unix_seconds(c.cast("timestamp"))
    val ints = Tables.orders(s, d).filter(col("o_totalprice") > 480000)
      .select(col("o_orderkey"), secs(col("o_orderdate")).as("lo"),
        (secs(col("o_orderdate")) + win).as("hi"))
    val pts = Tables.lineitem(s, d)
      .select(col("l_quantity"), secs(col("l_shipdate")).as("pt"))
    graft.operators.RangeJoinOps.pointInInterval(pts, ints, "pt", "lo", "hi", win)
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** As-of join (Flink temporal join / FOR SYSTEM_TIME AS OF): for each
    * purchase, the latest click at-or-before it for the same user. Spark
    * has no native ASOF; emulate with join + row_number. The oracle uses
    * the SAME window emulation so tie semantics are shared (SURVEY §7).
    * @note scale: the join+rank emulation shuffles matches; at 100 TB use
    *   a per-key sort-merge in one shuffle (range-partition by user, sort
    *   by ts, mapPartitions merge) — provided here as the declarative
    *   form so Catalyst can still prune columns. */
  private val joinAsof = Q(
    "join_asof",
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT * FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |        row_number() OVER (PARTITION BY p.event_id
      |          ORDER BY epoch_us(c.ts) DESC, c.event_id DESC) AS rn
      |      FROM p LEFT JOIN c ON c.user_id = p.user_id
      |        AND epoch_us(c.ts) <= epoch_us(p.ts))
      |SELECT purchase_id, click_id FROM j WHERE rn = 1
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"), col("ts").as("pts"))
    val c = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("ts").as("cts"))
    val w = Window.partitionBy("purchase_id")
      .orderBy(col("cts").desc, col("click_id").desc)
    p.join(c, col("pu") === col("cu") && col("cts") <= col("pts"), "left")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("purchase_id", "click_id")
      .orderBy("purchase_id")
  }

  /** Windowed stream-stream join (Flink DataStream join + TumblingWindow):
    * equi-join on (user, hour bucket); batch equivalent of J8/T9. */
  private val joinWindowed = Q(
    "join_windowed",
    """SELECT c.user_id AS user_id, CAST(date_trunc('hour', c.ts) AS VARCHAR) AS hour,
      |  count(*) AS pairs
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id
      | AND date_trunc('hour', c.ts) = date_trunc('hour', v.ts)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val c = e.where(col("event_type") === "click")
      .select(col("user_id"), date_trunc("hour", col("ts")).as("chb"))
    val v = e.where(col("event_type") === "view")
      .select(col("user_id").as("vu"), date_trunc("hour", col("ts")).as("vhb"))
    c.join(v, col("user_id") === col("vu") && col("chb") === col("vhb"))
      .groupBy(col("user_id"), col("chb").cast("string").as("hour"))
      .agg(count(lit(1)).as("pairs"))
      .orderBy("user_id", "hour")
  }

  private val joinCrossSmall = Q(
    "join_cross_small",
    "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name") {
    (s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_name", "n_name").orderBy("r_name", "n_name")
  }

  /** Theta (non-equi) join → broadcast nested loop.
    * @note scale: pure theta joins are O(n·m); at 100 TB this must become
    *   a band/histogram join (bucket both sides by acctbal range) — the
    *   declarative form here is the small-dim case where one side fits in
    *   a broadcast. */
  private val joinTheta = Q(
    "join_theta",
    """SELECT s_suppkey, count(c_custkey) AS cnt
      |FROM supplier LEFT JOIN customer ON s_acctbal > c_acctbal
      |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    Tables.supplier(s, d)
      .join(broadcast(Tables.customer(s, d)), col("s_acctbal") > col("c_acctbal"), "left")
      .groupBy("s_suppkey").agg(count(col("c_custkey")).as("cnt"))
      .orderBy("s_suppkey")
  }

  // ---------------------------------------------------------------- A: aggregations

  /** TPC-H Q1 shape — keyed hash aggregate with partial/final phases. */
  private val aggPricingSummary = Q(
    "agg_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${osum("l_quantity")} AS sum_qty,
       |  ${osum("l_extendedprice")} AS sum_base,
       |  ${osum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${osum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${oavg("l_quantity")} AS avg_qty,
       |  ${oavg("l_discount")} AS avg_disc,
       |  count(*) AS cnt
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val aggGlobal = Q(
    "agg_global",
    s"""SELECT count(*) AS cnt, ${osum("l_extendedprice")} AS total_price,
       |  ${oavg("l_discount")} AS avg_disc,
       |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
       |FROM lineitem""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).agg(
      count(lit(1)).as("cnt"),
      dsum(col("l_extendedprice")).as("total_price"),
      davg(col("l_discount")).as("avg_disc"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"))
  }

  private val aggCountDistinct = Q(
    "agg_count_distinct",
    """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  private val aggRollup = Q(
    "agg_rollup",
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
       |  ${osum("l_quantity")} AS sum_qty, count(*) AS cnt
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY rf, ls""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("cnt"))
      .orderBy("rf", "ls")
  }

  /** collect_list wrapped in array_sort + joined to a string: arrival order
    * is nondeterministic, sorted-string form is oracle-safe (§8.3). */
  private val aggCollect = Q(
    "agg_collect",
    """SELECT c_nationkey, array_to_string(list_sort(list(c_mktsegment)), ',') AS segs,
      |  count(*) AS cnt
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).groupBy("c_nationkey")
      .agg(concat_ws(",", array_sort(collect_list(col("c_mktsegment")))).as("segs"),
        count(lit(1)).as("cnt"))
      .orderBy("c_nationkey")
  }

  /** Typed incremental reduce (Flink KeyedStream#reduce analogue) via
    * groupByKey + reduceGroups; result declared relationally for oracle. */
  private val aggReduceMinmax = Q(
    "agg_reduce_minmax",
    """SELECT user_id, min(value) AS min_v, max(value) AS max_v, count(*) AS cnt
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.events(s, d).select(col("user_id"), col("value")).as[(Long, Double)]
      .map { case (u, v) => (u, v, v, 1L) }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, math.min(a._2, b._2), math.max(a._3, b._3), a._4 + b._4))
      .map(_._2)
      .toDF("user_id", "min_v", "max_v", "cnt")
      .orderBy("user_id")
  }

  /** Exact percentiles (approx sketches are not oracle-safe, §8.3). */
  private val aggPercentileExact = Q(
    "agg_percentile_exact",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
      |  round(quantile_cont(l_quantity, 0.50), 4) AS p50,
      |  round(quantile_cont(l_quantity, 0.75), 4) AS p75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.50)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------- W: OVER-window analytics

  /** Flink Top-N pattern: top-3 orders per customer. */
  private val windowTopnPergroup = Q(
    "window_topn_pergroup",
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** lag + first_value (W2 + W7): per-user event-over-event delta. */
  private val windowLagDelta = Q(
    "window_lag_delta",
    """SELECT user_id, event_id,
      |  round(value - lag(value) OVER w, 4) AS delta,
      |  first_value(value) OVER w AS first_v
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      round(col("value") - lag(col("value"), 1).over(w), 4).as("delta"),
      first(col("value")).over(w).as("first_v"))
      .orderBy("user_id", "event_id")
  }

  /** Running cumulative sum — exact decimal inside the frame (§8.3). */
  private val windowRunningSum = Q(
    "window_running_sum",
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      sum(col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Sliding row-frame moving average as exact-sum/count (engines may
    * associate frame additions differently; decimal sum removes that). */
  private val windowMovingAvg = Q(
    "window_moving_avg",
    """SELECT user_id, event_id,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
      |        / count(*) OVER w, 4) AS mavg
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-3, 0)
    Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      round(sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
        / count(lit(1)).over(w), 4).as("mavg"))
      .orderBy("user_id", "event_id")
  }

  /** RANGE frame over a numeric ordering column. */
  private val windowRangeFrame = Q(
    "window_range_frame",
    """SELECT user_id, event_id,
      |  count(*) OVER (PARTITION BY user_id ORDER BY value
      |    RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS cnt
      |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).selectExpr(
      "user_id", "event_id",
      """count(*) OVER (PARTITION BY user_id ORDER BY value
        |  RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS cnt""".stripMargin)
      .orderBy("user_id", "event_id")
  }

  /** GROUPS window frame — the third SQL frame unit (peer ROWS):
    * `GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING` sums over the
    * current peer group (equal order values) plus one peer group each
    * side. Spark has no GROUPS frames, so this is the canonical
    * emulation: `dense_rank` numbers the peer groups, then a RANGE
    * frame over that integer reproduces GROUPS exactly. The oracle
    * (DuckDB hasn't implemented GROUPS either) derives the same
    * semantics a THIRD way — aggregate each peer group, ROWS-frame
    * over the group table, join back — so the check is genuinely
    * cross-strategy, not the same query twice.
    *
    * @note scale: both window passes share one (partition, order)
    *   pair — Catalyst plans a single Exchange+Sort; the frame sum is
    *   the standard streaming frame evaluator. Decimal sum keeps the
    *   frame additions exact ([[graft.Det]]). */
  private val windowGroupsFrame = Q(
    "window_groups_frame",
    """WITH g AS (SELECT l_suppkey, l_shipdate,
      |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS s,
      |    row_number() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate) AS gi
      |  FROM lineitem WHERE l_suppkey < 10 GROUP BY 1, 2),
      |w AS (SELECT l_suppkey, l_shipdate,
      |    round(CAST(sum(s) OVER (PARTITION BY l_suppkey ORDER BY gi
      |      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE), 4) AS gsum
      |  FROM g)
      |SELECT l.l_suppkey, l.l_orderkey, l.l_linenumber, w.gsum
      |FROM lineitem l JOIN w ON l.l_suppkey = w.l_suppkey
      |  AND l.l_shipdate = w.l_shipdate
      |WHERE l.l_suppkey < 10
      |ORDER BY l.l_suppkey, l.l_shipdate, l.l_orderkey, l.l_linenumber""".stripMargin) { (s, d) =>
    val part = Window.partitionBy("l_suppkey")
    val g = dense_rank().over(part.orderBy("l_shipdate"))
    val frame = part.orderBy("g").rangeBetween(-1, 1)
    Tables.lineitem(s, d).filter(col("l_suppkey") < 10)
      .withColumn("g", g)
      .withColumn("gsum",
        round(sum(col("l_quantity").cast("decimal(18,6)")).over(frame)
          .cast("double"), 4))
      .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "gsum")
  }

  /** `max_by`/`min_by` (SQL:2023 `ANY_VALUE`-family ordered selectors;
    * DuckDB `arg_max`/`arg_min`): per nation, the customer name at the
    * extreme of a DETERMINISTIC selector key — account balance in
    * exact cents disambiguated by custkey, so ties are impossible and
    * the argmax is engine-independent.
    *
    * @note scale: single hash aggregation, partial (map-side) argmax
    *   merges like any semigroup — no window, no join. */
  private val aggArgminmax = Q(
    "agg_argminmax",
    """SELECT c_nationkey,
      |  arg_max(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS top_name,
      |  arg_min(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS bottom_name,
      |  arg_max(c_acctbal, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000 + c_custkey) AS top_bal
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    val key = (round(col("c_acctbal") * 100).cast("long") * 1000000L +
      col("c_custkey")).as("k")
    Tables.customer(s, d)
      .groupBy("c_nationkey")
      .agg(max_by(col("c_name"), key).as("top_name"),
        min_by(col("c_name"), key).as("bottom_name"),
        max_by(col("c_acctbal"), key).as("top_bal"))
      .orderBy("c_nationkey")
  }

  /** RATIO_TO_REPORT (share-of-total analytic): each customer's share
    * of its market segment's balance mass — numerator exact per-row,
    * denominator the exact decimal partition sum, ONE IEEE division,
    * round(6) presentation.
    * @note scale: a partition-total window is the classic two-pass
    *   frame Spark evaluates in one sort (unbounded frame computed
    *   once per partition) — a single exchange on the segment. */
  private val windowRatioToReport = Q(
    "window_ratio_to_report",
    """SELECT c_custkey, c_mktsegment,
      |  round(CAST(c_acctbal AS DOUBLE) /
      |        CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
      |             OVER (PARTITION BY c_mktsegment) AS DOUBLE), 6) AS share
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment")
    Tables.customer(s, d).select(
      col("c_custkey"), col("c_mktsegment"),
      round(col("c_acctbal").cast("double") /
        sum(col("c_acctbal").cast("decimal(18,6)")).over(w).cast("double"), 6)
        .as("share"))
      .orderBy("c_custkey")
  }

  private val windowNtile = Q(
    "window_ntile",
    """SELECT c_custkey, ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    Tables.customer(s, d).select(
      col("c_custkey"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pr"),
      round(cume_dist().over(w), 6).as("cd"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- O: sort / limit / top-k

  private val sortLimitOffset = Q(
    "sort_limit_offset",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100 OFFSET 50""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice")
      .offset(50).limit(100)
  }

  /** Global top-k → TakeOrderedAndProject (no full global sort).
    * @note scale: per-partition heaps + driver merge; O(k) memory. */
  private val topkGlobal = Q(
    "topk_global",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
  }

  // ---------------------------------------------------------------- U: set operations

  private val setopUnion = Q(
    "setop_union",
    """SELECT 'cust' AS src, c_custkey AS id FROM customer
      |UNION ALL SELECT 'supp' AS src, s_suppkey AS id FROM supplier
      |ORDER BY src, id""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(lit("cust").as("src"), col("c_custkey").as("id"))
      .unionByName(Tables.supplier(s, d).select(lit("supp").as("src"), col("s_suppkey").as("id")))
      .orderBy("src", "id")
  }

  private val setopUnionDistinct = Q(
    "setop_union_distinct",
    """SELECT c_nationkey AS k FROM customer
      |UNION SELECT s_nationkey AS k FROM supplier ORDER BY k""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("k"))
      .union(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
      .distinct()
      .orderBy("k")
  }

  private val setopIntersect = Q(
    "setop_intersect",
    """SELECT c_nationkey AS k FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("k"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
      .orderBy("k")
  }

  private val setopExcept = Q(
    "setop_except",
    """SELECT c_nationkey AS k FROM customer
      |EXCEPT SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("k"))
      .except(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
      .orderBy("k")
  }

  val all: Seq[Q] = Seq(
    projCompute, filterCompound, flatmapExplode, splitRoute,
    joinInner, joinOuterLeft, joinOuterRight, joinOuterFull, joinSemi, joinAnti,
    joinBroadcastDim, joinInterval, joinAsof, joinWindowed,
    joinCrossSmall, joinTheta, joinRangeBucketed,
    aggPricingSummary, aggGlobal, aggCountDistinct, aggRollup,
    aggCollect, aggReduceMinmax, aggPercentileExact,
    windowTopnPergroup, windowLagDelta, windowRunningSum,
    windowMovingAvg, windowRangeFrame, windowNtile,
    windowGroupsFrame, aggArgminmax, windowRatioToReport,
    sortLimitOffset, topkGlobal,
    setopUnion, setopUnionDistinct, setopIntersect, setopExcept)
}
