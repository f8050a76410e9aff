package graft.queries

import graft.{Det, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining Flink-pattern surfaces beyond the SURVEY §2 core:
  * count-based windows, typed coGroup/connect, CUBE and GROUPING SETS.
  */
object ExtendedQueries {

  // ------------------------------------------------------- count windows
  /** Flink `countWindow(10)`: per-key tumbling windows of 10 *events*
    * (not time). Batch-deterministic via (ts, event_id) arrival order —
    * bucket = (row_number−1) div 10.
    *
    * @note scale: one shuffle on the key; the row_number window is
    *   streaming-evaluated. A streaming twin would be
    *   `flatMapGroupsWithState` counting per key — same state shape as
    *   forward-fill. */
  private val windowCountBased = Q(
    "window_count_based",
    s"""SELECT user_id, CAST((rn - 1) // 10 AS INT) AS bucket,
       |  count(*) AS n, ${Det.osum("value")} AS sum_value
       |FROM (SELECT user_id, value,
       |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |      FROM events)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("bucket", expr("CAST((rn - 1) div 10 AS INT)"))
      .groupBy("user_id", "bucket")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "bucket")
  }

  // ------------------------------------------------------- typed coGroup
  /** Flink `coGroup` / `connect`+CoProcessFunction: per-key access to
    * BOTH inputs' full groups. Typed `Dataset.cogroup` with exact
    * decimal summation inside the function (order-independent, so the
    * nondeterministic group iteration order cannot perturb the result).
    *
    * @note scale: cogroup shuffles both sides once on the key; the
    *   function streams both iterators — no per-key materialization
    *   beyond what the function itself retains. */
  private val cogroupTyped = Q(
    "cogroup_typed",
    s"""WITH o AS (SELECT o_orderkey AS k, count(*) AS n_orders FROM orders GROUP BY 1),
       |l AS (SELECT l_orderkey AS k, count(*) AS n_items,
       |        ${Det.osum("l_extendedprice")} AS revenue FROM lineitem GROUP BY 1)
       |SELECT coalesce(o.k, l.k) AS o_orderkey,
       |  CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       |  CAST(coalesce(n_items, 0) AS BIGINT) AS n_items,
       |  CAST(coalesce(revenue, 0) AS DOUBLE) AS revenue
       |FROM o FULL JOIN l ON o.k = l.k ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val sp = s
    import sp.implicits._
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice")).as[(Long, Double)]
    orders.groupByKey(_._1).cogroup(items.groupByKey(_._1)) { (k, os, ls) =>
      var nOrders = 0L
      os.foreach(_ => nOrders += 1)
      var nItems = 0L
      var rev = BigDecimal(0)
      ls.foreach { case (_, p) =>
        nItems += 1
        rev += BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      Iterator((k, nOrders, nItems,
        rev.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toDF("o_orderkey", "n_orders", "n_items", "revenue")
      .orderBy("o_orderkey")
  }

  // ------------------------------------------------------- CUBE
  private val aggCube = Q(
    "agg_cube",
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
       |  ${Det.osum("l_quantity")} AS sum_qty, count(*) AS cnt
       |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY rf, ls""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(Det.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("cnt"))
      .orderBy("rf", "ls")
  }

  // ------------------------------------------------------- GROUPING SETS
  /** Explicit GROUPING SETS (A5's general form): the same ANSI string
    * runs on Spark (temp view) and DuckDB. */
  private val gsSql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_qty,
      |  count(*) AS cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  private val aggGroupingSets = Q("agg_grouping_sets", gsSql) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(gsSql)
  }

  // ------------------------------------------------------- native as-of join
  /** J7 through the custom operator ([[graft.plans.AsOfJoinExec]]):
    * same oracle as the window-emulation `join_asof` key, linear merge
    * instead of a quadratic per-key intermediate. */
  private val joinAsofNative = Q(
    "join_asof_native",
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
    graft.plans.AsOfJoinOps.asofJoin(p, c, p("pu"), c("cu"), p("pts"), c("cts"), c("click_id"))
      .select("purchase_id", "click_id")
      .orderBy("purchase_id")
  }

  // ------------------------------------------------------- pivot
  /** Pivot (dynamic columns from values) with explicit pivot values so
    * the output schema — and the oracle — is deterministic. */
  private val aggPivot = Q(
    "agg_pivot",
    s"""SELECT l_returnflag,
       |  CAST(round(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END), 4) AS DOUBLE) AS F,
       |  CAST(round(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END), 4) AS DOUBLE) AS O
       |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag").pivot("l_linestatus", Seq("F", "O"))
      .agg(Det.dsum(col("l_quantity")))
      .orderBy("l_returnflag")
  }

  // ------------------------------------------------------- posexplode
  /** Position-preserving explode (UDTF with ordinality). DuckDB 1.0
    * lacks WITH ORDINALITY; the oracle rebuilds positions with an
    * indexed list lambda. */
  private val flatmapPosexplode = Q(
    "flatmap_posexplode",
    """SELECT p_partkey, CAST(u.z['pos'] AS INT) AS pos, u.z['tok'] AS tok
      |FROM (SELECT p_partkey,
      |        unnest(list_transform(string_split(p_name, ' '),
      |               (x, i) -> {'pos': i - 1, 'tok': x})) AS z
      |      FROM part) u
      |ORDER BY p_partkey, pos""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"), posexplode(split(col("p_name"), " ")).as(Seq("pos", "tok")))
      .orderBy("p_partkey", "pos")
  }

  // ------------------------------------------------------- nth_value
  /** W7 extension: nth_value over an explicit full-partition frame. */
  private val windowNth = Q(
    "window_nth_value",
    """SELECT o_orderkey, o_custkey,
      |  nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy("o_orderkey")
  }

  // ------------------------------------------------------- CDC upsert
  /** Changelog/upsert materialization (Flink upsert stream → table,
    * SURVEY.md §2.9 T10's batch face): treat `events` as a keyed
    * changelog and materialize the LATEST row per key — the canonical
    * CDC compaction every lakehouse ingestion pipeline runs.
    * Deterministic tiebreak: (ts, event_id) descending.
    *
    * @note scale: one shuffle on the key; at 100 TB this is the
    *   max-timestamp-wins merge that AQE skew-splits per key range. The
    *   streaming twin is `dropDuplicatesWithinWatermark`-style state or
    *   `foreachBatch` MERGE INTO against the table format. */
  private val cdcUpsertLatest = Q(
    "cdc_upsert_latest",
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  value AS last_value, epoch_us(ts) AS last_ts_us
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        unix_micros(col("ts")).as("last_ts_us"))
      .orderBy("user_id")
  }

  /** Snapshot differencing ([[graft.operators.DiffOps.snapshotDiff]]):
    * the other CDC face — derive the changelog from two snapshots. The
    * two snapshots are carved deterministically from `orders`:
    * old = keys not divisible by 7, new = keys not divisible by 5 with
    * prices bumped by 1.0 on keys divisible by 3 — so all three change
    * classes occur and the oracle can state the same diff. */
  private val cdcSnapshotDiff = Q(
    "cdc_snapshot_diff",
    """WITH old_s AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0),
      |new_s AS (SELECT o_orderkey,
      |            o_totalprice + CASE WHEN o_orderkey % 3 = 0 THEN 1.0 ELSE 0.0 END AS o_totalprice
      |          FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
      |       WHEN n.o_orderkey IS NULL THEN 'delete'
      |       WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'update'
      |       END AS change
      |FROM old_s o FULL JOIN new_s n ON o.o_orderkey = n.o_orderkey
      |WHERE (o.o_orderkey IS NULL OR n.o_orderkey IS NULL
      |       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val ord = Tables.orders(s, d)
    val oldS = ord.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val newS = ord.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + when(col("o_orderkey") % 3 === 0, lit(1.0))
          .otherwise(lit(0.0))).as("o_totalprice"))
    graft.operators.DiffOps.snapshotDiff(oldS, newS,
        keyCols = Seq("o_orderkey"), cmpCols = Seq("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Secondary sort ([[graft.operators.KeyedOps.mapSortedGroups]]):
    * longest run of consecutive same-type events per user, computed by
    * an O(1)-state fold over each user's (ts, event_id)-ordered stream
    * — the order comes from the shuffle's own external sort, no
    * per-group buffering. The oracle states the same result with the
    * gaps-and-islands row_number trick, so the hash check pins the
    * ordered-iteration contract exactly. */
  private val stateMaxStreak = Q(
    "state_max_streak",
    """WITH o AS (SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rnt
      |  FROM events),
      |s AS (SELECT user_id, event_type, rn - rnt AS grp, count(*) AS streak
      |      FROM o GROUP BY 1, 2, 3)
      |SELECT user_id, max(streak) AS max_streak FROM s GROUP BY 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    graft.operators.KeyedOps.mapSortedGroups(ev, parts = 32)(
      key = _._1, order = e => (e._2, e._3)) { (uid, it) =>
      var prev: String = null
      var cur = 0L
      var best = 0L
      it.foreach { e =>
        cur = if (e._4 == prev) cur + 1 else 1
        prev = e._4
        if (cur > best) best = cur
      }
      if (best > 0) Iterator.single((uid, best)) else Iterator.empty
    }.toDF("user_id", "max_streak").orderBy("user_id")
  }

  /** SCD2 historization ([[graft.operators.DiffOps.scd2]]): each
    * user's `event_type` changelog collapsed to change points, stamped
    * with `[valid_from, valid_to)` validity (µs integers for the hash
    * oracle), version numbers, and an is_current flag. */
  private val cdcScd2 = Q(
    "cdc_scd2",
    """WITH o AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |c AS (SELECT user_id, event_type, event_id, ts_us FROM o
      |      WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, CAST(row_number() OVER w AS INT) AS version,
      |  event_type AS state, ts_us AS valid_from_us,
      |  lead(ts_us) OVER w AS valid_to_us,
      |  (lead(ts_us) OVER w IS NULL) AS is_current
      |FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |ORDER BY user_id, version""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    graft.operators.DiffOps.scd2(ev, keyCols = Seq("user_id"),
        orderCols = Seq("ts_us", "event_id"),
        attrCol = "event_type", tsCol = "ts_us")
      .select(col("user_id"), col("version"),
        col("event_type").as("state"),
        col("valid_from").as("valid_from_us"),
        col("valid_to").as("valid_to_us"), col("is_current"))
      .orderBy("user_id", "version")
  }

  /** Time-series gap filling ([[graft.operators.IntervalOps.gapFillHourly]]):
    * hourly count+sum per event_type INCLUDING the zero rows for empty
    * hours — the generated-grid left-join that dashboards and
    * window-over-window arithmetic need; the oracle builds the same
    * grid with generate_series. */
  private val aggGapFill = Q(
    "agg_gap_fill",
    s"""WITH b AS (SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS lo,
       |                 date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS hi FROM events),
       |g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ws FROM b),
       |t AS (SELECT DISTINCT event_type FROM events),
       |a AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type,
       |        count(*) AS n, ${Det.osum("value")} AS sv
       |      FROM events GROUP BY 1, 2)
       |SELECT CAST(g.ws AS VARCHAR) AS ws, t.event_type AS event_type,
       |  COALESCE(a.n, 0) AS n, COALESCE(a.sv, 0.0) AS sum_value
       |FROM g CROSS JOIN t
       |LEFT JOIN a ON a.ws = g.ws AND a.event_type = t.event_type
       |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    graft.operators.IntervalOps.gapFillHourly(Tables.events(s, d),
        tsCol = "ts", groupCol = "event_type", valueCol = "value")
      .select(col("ws").cast("string").as("ws"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("ws", "event_type")
  }

  /** Interval merging ([[graft.operators.IntervalOps.mergeIntervals]]):
    * each event opens a 30-minute activity lease; overlapping leases
    * per user merge into coverage islands — the explicit-interval
    * generalization of session windows, stated in the oracle with the
    * same running-max-end gaps-and-islands construction. */
  private val stateMergeIntervals = Q(
    "state_merge_intervals",
    """WITH iv AS (SELECT user_id, epoch_us(ts) AS s_us,
      |              epoch_us(ts) + 1800000000 AS e_us FROM events),
      |m AS (SELECT user_id, s_us, e_us,
      |        max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, e_us
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |      FROM iv),
      |f AS (SELECT user_id, s_us, e_us,
      |        sum(CASE WHEN pmax IS NULL OR s_us > pmax THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY user_id ORDER BY s_us, e_us
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |      FROM m)
      |SELECT user_id, min(s_us) AS ivl_start, max(e_us) AS ivl_end,
      |  count(*) AS n_merged
      |FROM f GROUP BY user_id, island
      |ORDER BY user_id, ivl_start""".stripMargin) { (s, d) =>
    val iv = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("s_us"))
      .withColumn("e_us", col("s_us") + lit(1800000000L))
    graft.operators.IntervalOps.mergeIntervals(iv,
        keyCols = Seq("user_id"), startCol = "s_us", endCol = "e_us")
      .orderBy("user_id", "ivl_start")
  }

  /** percent_rank / cume_dist: rank-derived RATIO analytics. Safe for
    * the hash oracle without rounding — both engines compute the same
    * IEEE division of the same two small integers, so the doubles are
    * bit-identical. */
  private val windowPercentRank = Q(
    "window_percent_rank",
    """SELECT o_orderkey, o_custkey,
      |  percent_rank() OVER w AS prk, cume_dist() OVER w AS cd
      |FROM orders WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        percent_rank().over(w).as("prk"), cume_dist().over(w).as("cd"))
      .orderBy("o_orderkey")
  }

  /** UNPIVOT/melt (wide→long): the four lineitem measures of small
    * orders as (metric, val) pairs — Spark's `unpivot` against DuckDB's
    * UNPIVOT clause. */
  private val aggUnpivot = Q(
    "agg_unpivot",
    """SELECT l_orderkey, l_linenumber, metric, val
      |FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
      |                 l_extendedprice, l_discount, l_tax
      |               FROM lineitem WHERE l_orderkey < 100)
      |      ON l_quantity, l_extendedprice, l_discount, l_tax
      |      INTO NAME metric VALUE val)
      |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "val")
      .orderBy("l_orderkey", "l_linenumber", "metric", "val")
  }

  /** Forward as-of through the SAME native merge operator: the first
    * click AT OR AFTER each purchase. Negating the µs time (and the
    * tiebreak id) turns the backward latest-≤ merge into forward
    * earliest-≥ — one operator serves both directions, the standard
    * trick instead of a second code path. */
  private val joinAsofForward = Q(
    "join_asof_forward",
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT * FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |        row_number() OVER (PARTITION BY p.event_id
      |          ORDER BY epoch_us(c.ts) ASC, c.event_id ASC) AS rn
      |      FROM p LEFT JOIN c ON c.user_id = p.user_id
      |        AND epoch_us(c.ts) >= epoch_us(p.ts))
      |SELECT purchase_id, click_id FROM j WHERE rn = 1
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        (-unix_micros(col("ts"))).as("npts"))
    val c = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        (-unix_micros(col("ts"))).as("ncts"), (-col("event_id")).as("ntie"))
    graft.plans.AsOfJoinOps.asofJoin(p, c, p("pu"), c("cu"),
        p("npts"), c("ncts"), c("ntie"))
      .select("purchase_id", "click_id")
      .orderBy("purchase_id")
  }

  /** As-of with a max-staleness tolerance: the latest click at most 2 h
    * before each purchase. Latest-≤ then null-if-stale is equivalent to
    * latest-within-[t−tol, t] (if the latest match is stale, no match
    * is inside the band), so the native merge needs no third code path
    * — tolerance is a post-projection on its output. */
  private val joinAsofTolerance = Q(
    "join_asof_tolerance",
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT * FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |        row_number() OVER (PARTITION BY p.event_id
      |          ORDER BY epoch_us(c.ts) DESC, c.event_id DESC) AS rn
      |      FROM p LEFT JOIN c ON c.user_id = p.user_id
      |        AND epoch_us(c.ts) <= epoch_us(p.ts)
      |        AND epoch_us(c.ts) >= epoch_us(p.ts) - 7200000000)
      |SELECT purchase_id, click_id FROM j WHERE rn = 1
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        unix_micros(col("ts")).as("pts"))
    val c = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        unix_micros(col("ts")).as("cts"))
    graft.plans.AsOfJoinOps.asofJoin(p, c, p("pu"), c("cu"),
        p("pts"), c("cts"), c("click_id"))
      .select(col("purchase_id"),
        when(col("pts") - col("cts") <= 7200000000L, col("click_id"))
          .as("click_id"))
      .orderBy("purchase_id")
  }

  /** Cohort retention: users bucketed by first-seen week, activity
    * counted per (cohort week, active week) — the canonical product
    * retention matrix. Weeks are integer `µs div 604800000000`, so the
    * whole key is integer-exact.
    *
    * @note scale: two shuffles (per-user min, then the matrix agg);
    *   the per-user distinct-week set is tiny, and the matrix is
    *   O(weeks²) rows regardless of input size. */
  private val aggCohortRetention = Q(
    "agg_cohort_retention",
    """WITH uw AS (SELECT DISTINCT user_id,
      |              epoch_us(ts) // 604800000000 AS wk FROM events),
      |co AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1)
      |SELECT co.cohort_wk, uw.wk, count(*) AS n_users
      |FROM uw JOIN co USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val uw = Tables.events(s, d)
      .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("wk"))
      .distinct()
    val co = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    uw.join(co, "user_id")
      .groupBy("cohort_wk", "wk")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "wk")
  }

  /** Rolling z-score anomaly flag WITHOUT floats: each event compared
    * against the mean/variance of its user's previous 5 values. The
    * test `(x−μ)² > 4σ²` is algebraically rescaled by n² to
    * `(n·x−S)² > 4·(n·SS−S²)` over integer micro-unit sums, computed
    * in DECIMAL(38,0) where squares exceed 64 bits — bit-exact on any
    * partitioning and engine, which a float σ never is. */
  private val windowZscore = Q(
    "window_zscore_anomaly",
    """WITH v AS (SELECT user_id, event_id,
      |    CAST(round(value * 1000000) AS BIGINT) AS v_u,
      |    epoch_us(ts) AS ts_us FROM events),
      |w AS (SELECT user_id, event_id, v_u,
      |    count(*) OVER win AS n,
      |    sum(v_u) OVER win AS s,
      |    sum(v_u * v_u) OVER win AS ss
      |  FROM v WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING))
      |SELECT user_id, event_id, v_u,
      |  (CAST(5 * v_u - s AS DECIMAL(38,0)) * CAST(5 * v_u - s AS DECIMAL(38,0))
      |   > CAST(4 AS DECIMAL(38,0)) * (CAST(5 AS DECIMAL(38,0)) * CAST(ss AS DECIMAL(38,0))
      |       - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))) AS is_anomaly
      |FROM w WHERE n = 5 ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val D0 = DecimalType(38, 0)
    val win = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id")).rowsBetween(-5, -1)
    val v = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 1000000).cast("long").as("v_u"),
        unix_micros(col("ts")).as("ts_us"))
    val base = v
      .withColumn("n", count(lit(1)).over(win))
      .withColumn("s", sum(col("v_u")).over(win))
      .withColumn("ss", sum(col("v_u") * col("v_u")).over(win))
      .filter(col("n") === 5)
    val dvt = (lit(5) * col("v_u") - col("s")).cast(D0)
    val rhs = lit(4).cast(D0) *
      (lit(5).cast(D0) * col("ss").cast(D0) - col("s").cast(D0) * col("s").cast(D0))
    base.select(col("user_id"), col("event_id"), col("v_u"),
        (dvt * dvt > rhs).as("is_anomaly"))
      .orderBy("user_id", "event_id")
  }

  /** Exponentially-weighted moving average per key (pandas
    * `ewm(alpha=0.5, adjust=True).mean()` semantics): each event's
    * smoothed level weights history by `(1-α)^(age in rows)` with
    * α = 1/2, computed as a RATIO OF TWO RUNNING SUMS over the scaled
    * series — `Σ x_j·2^j / Σ 2^j` with j the per-key row index — so
    * one window partitioning serves row-numbering and both cumsums
    * (one shuffle), and every weight `2^j` is an EXACT power-of-two
    * double both engines represent identically (a `pow(0.75, n)`-style
    * libm call would be the cross-engine wobble). Guard: `2^j`
    * overflows past j ≈ 1020, so a run longer than 900 rows per key
    * fails loudly naming the fix (chunk the series or rescale by the
    * frame minimum) instead of returning Inf/NaN quietly.
    *
    * @note scale: one hash shuffle on the key; the three window
    *   functions share the exchange and evaluate in one pass. The
    *   smoothing itself is the streaming-anomaly baseline every
    *   monitoring pipeline keeps per entity. */
  private val windowEwma = Q(
    "window_ewma",
    """WITH v AS (SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) - 1 AS j
      |  FROM events)
      |SELECT user_id, event_id,
      |  round(sum(value * power(2.0, j)) OVER win
      |        / sum(power(2.0, j)) OVER win, 6) AS ewma
      |FROM v
      |WINDOW win AS (PARTITION BY user_id ORDER BY j
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val win = Window.partitionBy("user_id").orderBy(col("j"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("j", row_number().over(byTime) - 1)
      .withColumn("j", when(col("j") >= 900, raise_error(concat(
          lit("window_ewma: run length "), col("j").cast("string"),
          lit(" >= 900 per key overflows the 2^j weight scale — chunk "),
          lit("the series or rescale by the frame minimum"))).cast("int"))
        .otherwise(col("j")))
      .withColumn("ewma", round(
        sum(col("value") * pow(lit(2.0), col("j"))).over(win) /
          sum(pow(lit(2.0), col("j"))).over(win), 6))
      .select("user_id", "event_id", "ewma")
      .orderBy("user_id", "event_id")
  }

  /** The UNBOUNDED-RUN EWMA route ([[windowEwma]]'s loud cap names
    * it): the same α = 1/2 exponential smoothing computed as the
    * per-key recurrence `t ← t/2 + v`, `w ← w/2 + 1`, `ewma = t/w`
    * over a [[graft.operators.KeyedOps.mapSortedGroups]] fold — O(1)
    * state per key, NO weight ever leaves [1, 2], so a run of any
    * length works (the r15 10× stress run pushed the ratio form's
    * `2^j` scale past double range at run length 900 — this is the
    * documented chunk/rescale fix, as the telescoped rescale of the
    * running-sum ratio). Same secondary-sort shuffle contract as
    * every keyed fold: one exchange, external sort, per-task memory
    * independent of run depth. The oracle replays the IDENTICAL
    * recurrence as a DuckDB recursive CTE (same IEEE op order:
    * `t/2 + v`, `w/2 + 1`, one division, round 6), so streaming-fold
    * == set-oriented recursion is certified bit-exactly.
    *
    * @note scale: one hash shuffle on the key + spillable sort — the
    *   100 TB shape for arbitrarily deep per-key history; the ratio
    *   form ([[windowEwma]]) stays the declarative route for runs
    *   under its scale guard. */
  private val windowEwmaLong = Q(
    "window_ewma_long",
    """WITH RECURSIVE v AS (
      |  SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS j
      |  FROM events),
      |r AS (
      |  SELECT user_id, event_id, j, value AS t, CAST(1 AS DOUBLE) AS w
      |  FROM v WHERE j = 1
      |  UNION ALL
      |  SELECT v.user_id, v.event_id, v.j, r.t / 2 + v.value, r.w / 2 + 1
      |  FROM r JOIN v ON v.user_id = r.user_id AND v.j = r.j + 1)
      |SELECT user_id, event_id, round(t / w, 6) AS ewma
      |FROM r ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d).select(col("user_id").cast("long"),
        col("event_id").cast("long"), unix_micros(col("ts")),
        col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
    graft.operators.KeyedOps.mapSortedGroups(ev, parts = 32)(
      _._1, t => (t._3, t._2)) { (k, it) =>
        var t = 0.0
        var w = 0.0
        it.map { case (_, eid, _, v) =>
          t = t / 2 + v
          w = w / 2 + 1
          (k, eid, t / w)
        }
      }
      .toDF("user_id", "event_id", "raw")
      .withColumn("ewma", round(col("raw"), 6)).drop("raw")
      .orderBy("user_id", "event_id")
  }

  /** [[windowEwmaLong]]'s recurrence fold generalized to ARBITRARY α —
    * here α = 1/4: `t ← t·(1−α) + v`, `w ← w·(1−α) + 1`,
    * `ewma = t/w`. The α = 1/2 special case wrote the decay as a
    * division; the general form is one multiply by `(1−α)`, and with
    * `1−α = 0.75` (a dyadic rational, exactly representable in
    * binary64) every step is a single IEEE multiply + add in the SAME
    * op order the DuckDB recursive CTE replays — so the certificate
    * is still bit-exact, for any dyadic α. Same
    * [[graft.operators.KeyedOps.mapSortedGroups]] contract: O(1) fold
    * state, spillable secondary sort, run length unbounded.
    *
    * @note scale: identical to [[windowEwmaLong]] — one hash shuffle
    *   on the key, external sort, per-task memory independent of the
    *   deepest key's history. */
  private val windowEwmaAlpha = Q(
    "window_ewma_alpha",
    """WITH RECURSIVE v AS (
      |  SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS j
      |  FROM events),
      |r AS (
      |  SELECT user_id, event_id, j, value AS t, CAST(1 AS DOUBLE) AS w
      |  FROM v WHERE j = 1
      |  UNION ALL
      |  SELECT v.user_id, v.event_id, v.j, r.t * 0.75 + v.value,
      |    r.w * 0.75 + 1
      |  FROM r JOIN v ON v.user_id = r.user_id AND v.j = r.j + 1)
      |SELECT user_id, event_id, round(t / w, 6) AS ewma
      |FROM r ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d).select(col("user_id").cast("long"),
        col("event_id").cast("long"), unix_micros(col("ts")),
        col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
    graft.operators.KeyedOps.mapSortedGroups(ev, parts = 32)(
      _._1, t => (t._3, t._2)) { (k, it) =>
        var t = 0.0
        var w = 0.0
        it.map { case (_, eid, _, v) =>
          t = t * 0.75 + v
          w = w * 0.75 + 1
          (k, eid, t / w)
        }
      }
      .toDF("user_id", "event_id", "raw")
      .withColumn("ewma", round(col("raw"), 6)).drop("raw")
      .orderBy("user_id", "event_id")
  }

  /** Mode (most frequent value) with an EXPLICIT tiebreak — built-in
    * `mode()` leaves ties unspecified in both engines, so the key
    * states the deterministic form every production dedup-to-one query
    * actually needs: max count, smallest value wins. */
  private val aggMode = Q(
    "agg_mode",
    """SELECT l_returnflag, l_quantity AS mode_qty, cnt
      |FROM (SELECT l_returnflag, l_quantity, count(*) AS cnt,
      |        row_number() OVER (PARTITION BY l_returnflag
      |          ORDER BY count(*) DESC, l_quantity) AS rn
      |      FROM lineitem GROUP BY l_returnflag, l_quantity)
      |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("cnt").desc, col("l_quantity"))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
      .orderBy("l_returnflag")
  }

  /** Exact covariance via integer micro-units — `covar_pop` is float
    * order-dependent, so the key computes the algebraically equivalent
    * `(n·Σxy − Σx·Σy) / n²` from EXACT decimal sums and divides once at
    * the end (identical decimal→double conversion on both engines).
    * Scaled back to natural units by the fixed-point factor 10⁴. */
  private val aggCovar = Q(
    "agg_covar_exact",
    """WITH u AS (SELECT l_returnflag,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |g AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |        CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |        CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
      |      FROM u GROUP BY 1)
      |SELECT l_returnflag, n,
      |  CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
      |    / CAST(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) AS DOUBLE)
      |    / 10000.0 AS covar_pop
      |FROM g ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val D0 = DecimalType(38, 0)
    val u = Tables.lineitem(s, d).select(col("l_returnflag"),
      round(col("l_quantity") * 100).cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
    u.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(D0)).cast(D0).as("sx"),
        sum(col("y").cast(D0)).cast(D0).as("sy"),
        sum(col("x").cast(D0) * col("y").cast(D0)).cast(D0).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        ((col("n").cast(D0) * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n").cast(D0) * col("n").cast(D0)).cast("double")
          / lit(10000.0)).as("covar_pop"))
      .orderBy("l_returnflag")
  }

  /** Exact Pearson correlation — [[aggCovar]]'s companion: every moment
    * (Σx, Σy, Σxy, Σx², Σy²) is an EXACT decimal sum of integer
    * micro-units, so the only float steps are the final decimal→double
    * conversions and one sqrt/divide written identically on both
    * engines. The fixed-point factor cancels between numerator and
    * denominator, so no unscaling is needed; rounded to 6 to absorb the
    * last-bit of the double division. */
  private val aggCorr = Q(
    "agg_corr_exact",
    """WITH u AS (SELECT l_returnflag,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |g AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |        CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |        CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
      |        CAST(sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |        CAST(sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
      |      FROM u GROUP BY 1)
      |SELECT l_returnflag, n,
      |  round(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
      |    / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
      |           * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)), 6) AS corr
      |FROM g ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val D0 = DecimalType(38, 0)
    val u = Tables.lineitem(s, d).select(col("l_returnflag"),
      round(col("l_quantity") * 100).cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
    u.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(D0)).cast(D0).as("sx"),
        sum(col("y").cast(D0)).cast(D0).as("sy"),
        sum(col("x").cast(D0) * col("y").cast(D0)).cast(D0).as("sxy"),
        sum(col("x").cast(D0) * col("x").cast(D0)).cast(D0).as("sxx"),
        sum(col("y").cast(D0) * col("y").cast(D0)).cast(D0).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n").cast(D0) * col("sxy") - col("sx") * col("sy")).cast("double")
          / sqrt((col("n").cast(D0) * col("sxx") - col("sx") * col("sx")).cast("double")
            * (col("n").cast(D0) * col("syy") - col("sy") * col("sy")).cast("double")), 6)
          .as("corr"))
      .orderBy("l_returnflag")
  }

  /** MERGE-shaped changelog application ([[graft.operators.DiffOps
    * .applyChangelog]]): derive the old→new changelog with
    * [[graft.operators.DiffOps.snapshotDiff]], attach the new payload,
    * apply it to the old snapshot — and the oracle is simply the NEW
    * snapshot's defining expression, so the hash check pins the
    * diff→apply round trip end to end. */
  private val cdcApplyChangelog = Q(
    "cdc_apply_changelog",
    """SELECT o_orderkey,
      |  o_totalprice + CASE WHEN o_orderkey % 3 = 0 THEN 1.0 ELSE 0.0 END AS o_totalprice
      |FROM orders WHERE o_orderkey % 5 <> 0 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val ord = Tables.orders(s, d)
    val oldS = ord.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val newS = ord.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + when(col("o_orderkey") % 3 === 0, lit(1.0))
          .otherwise(lit(0.0))).as("o_totalprice"))
    val changes = graft.operators.DiffOps.snapshotDiff(oldS, newS,
        keyCols = Seq("o_orderkey"), cmpCols = Seq("o_totalprice"))
      .join(newS, Seq("o_orderkey"), "left")
    graft.operators.DiffOps.applyChangelog(oldS, changes,
        keyCols = Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** Per-event session-id projection ([[graft.operators.IntervalOps
    * .sessionIds]]): every event labeled with its user's 30-minute-gap
    * session ordinal — the row-level complement of the session-window
    * aggregations. */
  private val stateSessionIds = Q(
    "state_session_ids",
    """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events)
      |SELECT user_id, event_id,
      |  CAST(sum(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
      |             THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
      |FROM o ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
    graft.operators.IntervalOps.sessionIds(ev, keyCols = Seq("user_id"),
        tsCol = "ts_us", tieCol = "event_id", gapUs = 1800000000L)
      .select("user_id", "event_id", "session_id")
      .orderBy("user_id", "event_id")
  }

  /** Gap+duration-capped sessionization
    * ([[graft.operators.IntervalOps.sessionIdsCapped]], 30 min gap,
    * 3 h cap): the cap chains each break to the session's start, so no
    * window frame expresses it — the Spark side is a keyed O(1)-state
    * fold, and the oracle walks the SAME chain with a per-key recursive
    * CTE over session starts: genuinely different strategies, equal
    * rows. */
  private[queries] val stateSessionCapped = Q(
    "state_session_capped",
    """WITH RECURSIVE
      |e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY epoch_us(ts), event_id) AS pos
      |      FROM events),
      |g AS (SELECT e.*, t - lag(t) OVER (PARTITION BY user_id ORDER BY pos) AS gap
      |      FROM e),
      |s AS (
      |  SELECT user_id, pos AS spos, t AS st FROM g WHERE pos = 1
      |  UNION ALL
      |  SELECT g2.user_id, g2.pos AS spos, g2.t AS st
      |  FROM s JOIN g g2 ON g2.user_id = s.user_id
      |  WHERE g2.pos = (SELECT min(g3.pos) FROM g g3
      |      WHERE g3.user_id = s.user_id AND g3.pos > s.spos
      |        AND (g3.gap > 1800000000 OR g3.t - s.st > 10800000000)))
      |SELECT e.user_id, e.event_id,
      |  CAST((SELECT count(*) FROM s
      |        WHERE s.user_id = e.user_id AND s.spos <= e.pos) AS INT) AS session_id
      |FROM e ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
    graft.operators.IntervalOps.sessionIdsCapped(ev, keyCol = "user_id",
        tsUsCol = "ts_us", idCol = "event_id",
        gapUs = 1800000000L, capUs = 10800000000L)
      .orderBy("user_id", "event_id")
  }

  /** Conditional MERGE ([[graft.operators.DiffOps.mergeNewer]]): the
    * events changelog split by event-id parity into two compacted
    * halves, then merged update-if-newer — for every key the merge must
    * pick whichever half holds the overall-latest row, so the result
    * equals compacting the WHOLE changelog and the oracle is verbatim
    * `cdc_upsert_latest`'s. Parity (not time) splitting makes the
    * condition do real work: neither side is uniformly newer. */
  private val cdcMergeNewer = Q(
    "cdc_merge_newer",
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  value AS last_value, epoch_us(ts) AS last_ts_us
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    def compact(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("last_ts_us").desc, col("last_event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn")
    }
    val ev = Tables.events(s, d).select(col("user_id"),
      col("event_id").as("last_event_id"), col("event_type").as("last_type"),
      col("value").as("last_value"), unix_micros(col("ts")).as("last_ts_us"))
    val base = compact(ev.filter(col("last_event_id") % 2 === 0))
    val incoming = compact(ev.filter(col("last_event_id") % 2 === 1))
    graft.operators.DiffOps.mergeNewer(base, incoming,
        keyCols = Seq("user_id"),
        versionCols = Seq("last_ts_us", "last_event_id"))
      .select("user_id", "last_event_id", "last_type", "last_value",
        "last_ts_us")
      .orderBy("user_id")
  }

  /** Ordered string aggregation (LISTAGG WITHIN GROUP ↔ DuckDB
    * string_agg ORDER BY): deterministic because the intra-group order
    * is total. */
  private val aggStringConcat = Q(
    "agg_string_concat",
    """SELECT r_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_regionkey ORDER BY r_regionkey""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .join(Tables.region(s, d),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_regionkey")
      .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
        .as("names"))
      .orderBy("r_regionkey")
  }

  /** Trailing TIME-range window frame (RANGE over µs, not ROWS): each
    * event's count/sum over its user's previous hour — the "rolling 1h
    * metric per event" shape. ROWS frames can't express this (event
    * density varies); the µs-integer RANGE frame is exact and identical
    * in both engines. */
  private val windowTimeRange = Q(
    "window_time_range",
    """SELECT user_id, event_id, n_1h,
      |  CAST(round(sum_1h_d, 4) AS DOUBLE) AS sum_1h
       |FROM (SELECT user_id, event_id,
       |        count(*) OVER w AS n_1h,
       |        sum(CAST(value AS DECIMAL(18,6))) OVER w AS sum_1h_d
       |      FROM events
       |      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
       |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_1h"),
        round(sum(col("value").cast(DecimalType(18, 6))).over(w), 4)
          .cast("double").as("sum_1h"))
      .orderBy("user_id", "event_id")
  }

  /** A4 approximate sketches as first-class keys. Sketch outputs are
    * engine-specific (HLL++ / KLL internals), so these take the
    * driver's rows-only check; their accuracy against the exact
    * aggregates is gated by `SketchAccuracySpec` (±5% / ±1 rank).
    *
    * @note scale: THIS is the 100 TB path for distinct counts and
    *   quantiles — fixed-size sketch state, partial-merge friendly,
    *   one-pass; the exact twins (`agg_count_distinct`,
    *   `agg_percentile_exact`) are the correctness anchors. */
  private val aggApproxDistinct = Q.noOracle("agg_approx_distinct") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
      .orderBy("l_returnflag")
  }

  private val aggApproxQuantile = Q.noOracle("agg_approx_quantile") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
          .as("p95"))
      .orderBy("l_returnflag")
  }

  /** Mergeable-sketch rollup — the INCREMENTAL distinct-count pattern a
    * 100 TB warehouse runs: per-partition (here per-nation) HLL
    * sketches built independently, persisted as binary, then
    * `hll_union_agg` merges them into the global estimate WITHOUT
    * re-reading the base data. Register-wise max is associative, so
    * the merged estimate tracks a direct whole-table sketch within 1%
    * (exact equality breaks only at DataSketches' sparse→dense mode
    * transition; `HllMergeSpec` pins the 1% band plus the ±5% accuracy
    * gate vs the exact count). Rows-only: sketch internals are
    * engine-specific.
    *
    * @note scale: each rollup job sketches only its partition; the
    *   merge reads |partitions| fixed-size binaries — distinct counts
    *   over a year of data cost one day's scan per day, never a
    *   re-scan of history. */
  private val aggHllMergeable = Q.noOracle("agg_hll_mergeable") { (s, d) =>
    val sk = Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
        count(lit(1)).as("n_rows"))
    sk.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_custs"),
        sum(col("n_rows")).as("total_rows"))
  }

  /** Mergeable-sketch QUANTILE rollup — [[aggHllMergeable]]'s twin for
    * percentiles: per-group KLL sketches (Spark 4.1's DataSketches
    * `kll_sketch_agg_double` builtin) built independently, then
    * `kll_merge_agg_double` combines them into whole-table p50/p95
    * WITHOUT re-reading the base data — the incremental-quantile
    * pattern (Karnin-Lang-Liberty, FOCS'16) a 100 TB warehouse uses
    * for latency/price percentiles over rolling history. Rows-only:
    * sketch internals (and KLL's randomized compaction) are
    * engine-specific; `KllMergeSpec` rank-gates the estimates against
    * the exact distribution and pins merge≈direct.
    *
    * @note scale: fixed-size sketch state (k=1024 ≈ 1.3% rank error),
    *   partial-merge friendly, one pass per partition + a
    *   |partitions|-row merge. */
  private val aggKllMergeable = Q.noOracle("agg_kll_mergeable") { (s, d) =>
    val sk = Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(expr("kll_sketch_agg_double(l_extendedprice, 1024)").as("sk"),
        count(lit(1)).as("n_rows"))
    sk.agg(
      expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5d)")
        .as("approx_p50"),
      expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.95d)")
        .as("approx_p95"),
      sum(col("n_rows")).as("total_rows"))
  }

  /** Mergeable COUNT-MIN sketch
    * ([[graft.functions.SketchAggregators.CountMin]]) — per-key
    * frequencies, the capability HLL (distincts) and KLL (quantiles)
    * don't cover: per-orderstatus sketches of o_custkey built
    * independently, merged DECLARATIVELY (posexplode + sum — counter
    * addition is the merge), then point-estimated for 5 probe
    * customers. Unlike the DataSketches keys this sketch's arithmetic
    * is engine-portable integers, so the DuckDB oracle REBUILDS the
    * counters and hash-checks the estimates exactly — a fully
    * oracle-verified approximate structure.
    *
    * @note scale: buffers are depth·width longs per group however many
    *   rows stream in; the merge is a width-bounded shuffle; per-day
    *   sketches roll up without re-reading history. */
  private val aggCmsMergeable = Q(
    "agg_cms_mergeable",
    """WITH consts(i, a, b) AS (VALUES
      |    (0, 1000000007, 12345), (1, 998244353, 67891),
      |    (2, 786433, 13579), (3, 104857601, 24680)),
      |probes(k) AS (VALUES (0), (1), (2), (3), (4)),
      |per AS (SELECT c.i,
      |    ((CAST(c.a AS BIGINT) * (o.o_custkey % 2147483647) + c.b) % 2147483647) % 2048 AS cell,
      |    count(*) AS n
      |  FROM orders o CROSS JOIN consts c GROUP BY 1, 2),
      |pc AS (SELECT c.i, p.k,
      |    ((CAST(c.a AS BIGINT) * (p.k % 2147483647) + c.b) % 2147483647) % 2048 AS cell
      |  FROM consts c CROSS JOIN probes p)
      |SELECT CAST(pc.k AS BIGINT) AS o_custkey,
      |  CAST(min(COALESCE(per.n, 0)) AS BIGINT) AS est_n
      |FROM pc LEFT JOIN per ON per.i = pc.i AND per.cell = pc.cell
      |GROUP BY pc.k ORDER BY o_custkey""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    val sp = s
    import sp.implicits._
    val depth = 4
    val width = 2048
    val cms = new SketchAggregators.CountMin(depth, width)
    val per = Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_custkey"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(cms.toColumn.name("sk"))
      .toDF("o_orderstatus", "sk")
    val merged = per
      .select(posexplode(col("sk")).as(Seq("pos", "cnt")))
      .groupBy("pos").agg(sum("cnt").as("cnt"))
    val probeCells = (for { k <- 0L to 4L; i <- 0 until depth }
      yield (k, i * width + SketchAggregators.CountMin.cell(k, i, width)))
      .toDF("o_custkey", "pos")
    probeCells.join(merged, "pos")
      .groupBy("o_custkey").agg(min("cnt").as("est_n"))
      .orderBy("o_custkey")
  }

  /** Count-MEAN-min estimates from the SAME mergeable CMS counters
    * (Deng & Rafiei, "New estimation algorithms for streaming data:
    * count-min can do more", 2007): each row's counter is debiased by
    * the expected hash-collision noise `(N − c) / (width − 1)`, the
    * median of the debiased rows replaces the min, and the result is
    * clamped into `[0, est_min]` — so `est_cmm ≤ est_n` BY
    * CONSTRUCTION (the bound `CmsVariantsSpec` also proves against
    * exact counts). This is the deterministic tightening of CMS: the
    * popular alternative, conservative update, makes each increment
    * depend on the counters at the moment it arrives — stream-order-
    * dependent, so two partitionings give two different sketches and
    * elementwise-add merge breaks its invariant. It is therefore NOT a
    * mergeable summary and can't be a distributed operator under this
    * library's determinism contract; `CmsVariantsSpec` pins its bound
    * relationship (cons ≤ plain per cell) with a sequential reference
    * instead. CMM keeps full mergeability (the debias reads only the
    * final merged counters) — the right variant at 100 TB.
    *
    * Every step is integer counts + one exact-input IEEE division, so
    * the oracle rebuilds both estimates and the key is hash-verified
    * like [[aggCmsMergeable]].
    *
    * Width is deliberately NARROW here (128 vs [[aggCmsMergeable]]'s
    * 2048): the debias matters exactly when cells are heavily collided
    * (distinct keys ≫ width — at 100 TB, always); in that regime on
    * this fixture CMM lands within single digits of the exact counts
    * while the plain min is ~10× over. In the uncollided regime the
    * deduction over-corrects — use the plain estimate there.
    *
    * @note scale: identical build/merge to [[aggCmsMergeable]]; the
    *   debias touches only the probed cells of the merged
    *   depth·width-long table. */
  private val aggCmsMeanmin = Q(
    "agg_cms_meanmin",
    """WITH consts(i, a, b) AS (VALUES
      |    (0, 1000000007, 12345), (1, 998244353, 67891),
      |    (2, 786433, 13579), (3, 104857601, 24680)),
      |probes(k) AS (VALUES (0), (1), (2), (3), (4)),
      |per AS (SELECT c.i,
      |    ((CAST(c.a AS BIGINT) * (o.o_custkey % 2147483647) + c.b) % 2147483647) % 128 AS cell,
      |    count(*) AS n
      |  FROM orders o CROSS JOIN consts c GROUP BY 1, 2),
      |tot AS (SELECT count(*) AS nn FROM orders),
      |pc AS (SELECT c.i, p.k,
      |    ((CAST(c.a AS BIGINT) * (p.k % 2147483647) + c.b) % 2147483647) % 128 AS cell
      |  FROM consts c CROSS JOIN probes p),
      |cells AS (SELECT pc.k, COALESCE(per.n, 0) AS n,
      |    CAST(COALESCE(per.n, 0) AS DOUBLE)
      |      - CAST(tot.nn - COALESCE(per.n, 0) AS DOUBLE) / 127.0 AS corr
      |  FROM pc LEFT JOIN per ON per.i = pc.i AND per.cell = pc.cell CROSS JOIN tot),
      |g AS (SELECT k, min(n) AS est_n, list(corr ORDER BY corr) AS cs
      |      FROM cells GROUP BY k)
      |SELECT CAST(k AS BIGINT) AS o_custkey, CAST(est_n AS BIGINT) AS est_n,
      |  round(least(CAST(est_n AS DOUBLE), greatest((cs[2] + cs[3]) / 2.0, 0.0)), 4) AS est_cmm
      |FROM g ORDER BY o_custkey""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    val sp = s
    import sp.implicits._
    val depth = 4
    val width = 128
    val cms = new SketchAggregators.CountMin(depth, width)
    val per = Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_custkey"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(cms.toColumn.name("sk"))
      .toDF("o_orderstatus", "sk")
    val merged = per
      .select(posexplode(col("sk")).as(Seq("pos", "cnt")))
      .groupBy("pos").agg(sum("cnt").as("cnt"))
    // every sketch row receives one increment per input row, so row 0's
    // cell sum IS the total count — no second scan of the base table
    val tot = merged.filter(col("pos") < width).agg(sum("cnt").as("nn"))
    val probeCells = (for { k <- 0L to 4L; i <- 0 until depth }
      yield (k, i * width + SketchAggregators.CountMin.cell(k, i, width)))
      .toDF("o_custkey", "pos")
    val cells = probeCells.join(merged, "pos")
      .crossJoin(broadcast(tot))
      .withColumn("corr", col("cnt").cast("double") -
        (col("nn") - col("cnt")).cast("double") / lit((width - 1).toDouble))
    cells.groupBy("o_custkey")
      .agg(min("cnt").as("est_n"),
        sort_array(collect_list(col("corr"))).as("cs"))
      .select(col("o_custkey"), col("est_n"),
        round(least(col("est_n").cast("double"),
          greatest((element_at(col("cs"), 2) + element_at(col("cs"), 3)) / lit(2.0),
            lit(0.0))), 4).as("est_cmm"))
      .orderBy("o_custkey")
  }

  /** KMV / bottom-k distinct rollup
    * ([[graft.functions.SketchAggregators.BottomK]]) — the
    * theta-sketch estimator family with every internal engine-portable:
    * per-orderstatus bottom-256 hash sketches of o_custkey built
    * independently, merged by union + re-trim into the global estimate
    * WITHOUT re-reading base data (the [[aggHllMergeable]] shape), and
    * — unlike the DataSketches keys — the DuckDB oracle REBUILDS the
    * hashes, the bottom-k selection, and the `(k−1)·M / h_k` estimate,
    * so the whole path is hash-verified. Output: one estimate per
    * group plus the merged `ALL` row. `KmvSpec` additionally gates the
    * estimates against exact distinct counts.
    *
    * @note scale: ≤ k longs per (partition, group) buffer; the merge
    *   explodes |groups|·k values once — metadata-sized however large
    *   the corpus. */
  private val aggKmvMergeable = Q(
    "agg_kmv_mergeable",
    s"""WITH h AS (SELECT DISTINCT o_orderstatus,
       |    ${graft.functions.SketchAggregators.BottomK.oHash("o_custkey")} AS h
       |  FROM orders),
       |rk AS (SELECT o_orderstatus, h,
       |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY h) AS rk
       |  FROM h),
       |sk AS (SELECT o_orderstatus, h FROM rk WHERE rk <= 256),
       |pest AS (SELECT o_orderstatus AS scope,
       |    CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
       |         ELSE round(547608329985.0 / CAST(max(h) AS DOUBLE), 4) END AS est_distinct
       |  FROM sk GROUP BY 1),
       |uni AS (SELECT h, row_number() OVER (ORDER BY h) AS urk
       |  FROM (SELECT DISTINCT h FROM sk)),
       |gest AS (SELECT 'ALL' AS scope,
       |    CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
       |         ELSE round(547608329985.0 / CAST(max(h) AS DOUBLE), 4) END AS est_distinct
       |  FROM uni WHERE urk <= 256)
       |SELECT scope, est_distinct FROM pest
       |UNION ALL SELECT scope, est_distinct FROM gest
       |ORDER BY scope""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    val sp = s
    import sp.implicits._
    val k = 256
    val kmv = new SketchAggregators.BottomK(k)
    // 255 · (2³¹−1) — exact below 2⁵³, matching the oracle's literal
    val scale = 255.0 * 2147483647.0
    def est(cnt: org.apache.spark.sql.Column,
        hk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(cnt < k, cnt.cast("double"))
        .otherwise(round(lit(scale) / hk.cast("double"), 4))
    val per = Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_custkey"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(kmv.toColumn.name("sk"))
      .toDF("o_orderstatus", "sk")
    val perEst = per.select(col("o_orderstatus").as("scope"),
      est(size(col("sk")).cast("long"), element_at(col("sk"), k)).as("est_distinct"))
    // merged sketch = bottom-k of the union of retained values — the
    // same result merging the binary sketches would give
    val uni = per.select(explode(col("sk")).as("h")).distinct()
      .orderBy("h").limit(k)
      .agg(count(lit(1)).as("cnt"), max(col("h")).as("hk"))
    val gest = uni.select(lit("ALL").as("scope"),
      est(col("cnt"), col("hk")).as("est_distinct"))
    perEst.unionByName(gest).orderBy("scope")
  }

  /** PORTABLE mergeable QUANTILES — the oracle-verified counterpart of
    * [[aggKllMergeable]] (whose DataSketches KLL internals are
    * engine-specific AND order-dependent): a fixed 1024-bin equi-width
    * histogram over a documented static domain ([0, 120000) cents-exact
    * — `bin = (round(price·100)·1024) div 12·10⁶`, pure integer
    * arithmetic), per-group counts merged into the ALL scope by
    * addition (associative, order-independent — map-side combine
    * applies), and p50/p95 read off the merged counts as the upper
    * edge of the first bin reaching `⌈p·n⌉` (the edge
    * `(bin+1)·117.1875` is an exact dyadic, so even the double output
    * is bit-deterministic). Honest error bound: one bin width
    * (117.19) — the trade for a sketch every engine can rebuild; the
    * DuckDB oracle rebuilds bins, cumulative ranks and both estimates
    * and hash-checks all of it.
    *
    * @note scale: ≤ 1024 longs per (partition, group); the ALL merge
    *   reads |groups|·bins count rows — metadata-sized; one shuffle on
    *   the group key. */
  private val aggHistMergeable = Q(
    "agg_hist_mergeable",
    """WITH b AS (SELECT l_returnflag AS g,
      |    least(1023, (CAST(round(l_extendedprice * 100) AS BIGINT) * 1024)
      |                // 12000000) AS bin
      |  FROM lineitem),
      |c AS (SELECT g AS scope, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
      |c2 AS (SELECT scope, bin, cnt FROM c
      |       UNION ALL
      |       SELECT 'ALL', bin, sum(cnt) FROM c GROUP BY 2),
      |w AS (SELECT scope, bin, cnt,
      |        sum(cnt) OVER (PARTITION BY scope ORDER BY bin
      |                       ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(cnt) OVER (PARTITION BY scope) AS n
      |      FROM c2)
      |SELECT scope, CAST(max(n) AS BIGINT) AS n_rows,
      |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bin END) + 1 AS DOUBLE)
      |    * 117.1875 AS p50_est,
      |  CAST(min(CASE WHEN cum >= (95 * n + 99) // 100 THEN bin END) + 1 AS DOUBLE)
      |    * 117.1875 AS p95_est
      |FROM w GROUP BY scope ORDER BY scope""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val binned = Tables.lineitem(s, d).select(col("l_returnflag").as("g"),
      least(lit(1023L),
        expr("(CAST(round(l_extendedprice * 100) AS BIGINT) * 1024) div 12000000"))
        .as("bin"))
    val cnts = binned.groupBy(col("g").as("scope"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .persist() // feeds the per-group rows AND the ALL merge
    // merged ALL histogram = per-bin SUM of the group histograms
    val allCnts = cnts.groupBy("bin").agg(sum(col("cnt")).as("cnt"))
      .select(lit("ALL").as("scope"), col("bin"), col("cnt"))
    val w = cnts.unionByName(allCnts)
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("scope")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("scope"))))
    w.groupBy("scope")
      .agg(max(col("n")).as("n_rows"),
        ((min(when(col("cum") >= expr("(n + 1) div 2"), col("bin"))) + 1)
          .cast("double") * lit(117.1875)).as("p50_est"),
        ((min(when(col("cum") >= expr("(95 * n + 99) div 100"), col("bin"))) + 1)
          .cast("double") * lit(117.1875)).as("p95_est"))
      .orderBy("scope")
  }

  /** PORTABLE distinct-set ALGEBRA over [[aggKmvMergeable]]'s bottom-k
    * sketches (Beyer et al., "On synopses for distinct value estimation
    * under multiset operations", SIGMOD'07) — the oracle-verified twin
    * of [[aggThetaSetops]]: clicker and purchaser user sketches built
    * in one scan, then union / intersection / difference distinct
    * counts from sketch algebra alone. The combined sketch is the
    * bottom-k of the two retained sets; every retained value sits below
    * both sides' k-th minima, so `v ∈ K_A` is an EXACT membership test
    * for "v among A's distinct hashes" — intersection and difference
    * fractions are therefore exact set ops on retained values, scaled
    * by the union estimate. Below k total distincts every estimate
    * degenerates to the exact count. All integer set ops + IEEE
    * mul/div — the DuckDB oracle REBUILDS the whole algebra and
    * hash-checks all three estimates (the DataSketches twin stays
    * rows-only for its engine-specific theta internals).
    *
    * @note scale: two ≤ k-long arrays however many events stream in;
    *   the algebra is array math on one driver-sized row. */
  private val aggKmvSetops = Q(
    "agg_kmv_setops",
    s"""WITH ch AS (SELECT DISTINCT
       |    ${graft.functions.SketchAggregators.BottomK.oHash("user_id")} AS h
       |  FROM events WHERE event_type = 'click'),
       |ka AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk
       |                      FROM ch) WHERE rk <= 256),
       |ph AS (SELECT DISTINCT
       |    ${graft.functions.SketchAggregators.BottomK.oHash("user_id")} AS h
       |  FROM events WHERE event_type = 'purchase'),
       |kb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk
       |                      FROM ph) WHERE rk <= 256),
       |u AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk
       |                     FROM (SELECT DISTINCT h FROM
       |                       (SELECT h FROM ka UNION ALL SELECT h FROM kb)))
       |      WHERE rk <= 256),
       |st AS (SELECT count(*) AS nv, max(h) AS hk,
       |    sum(CASE WHEN h IN (SELECT h FROM ka)
       |              AND h IN (SELECT h FROM kb) THEN 1 ELSE 0 END) AS nboth,
       |    sum(CASE WHEN h IN (SELECT h FROM ka)
       |              AND h NOT IN (SELECT h FROM kb) THEN 1 ELSE 0 END) AS nonly
       |  FROM u),
       |est AS (SELECT nv, nboth, nonly,
       |    CASE WHEN nv < 256 THEN CAST(nv AS DOUBLE)
       |         ELSE 547608329985.0 / CAST(hk AS DOUBLE) END AS eu
       |  FROM st)
       |SELECT round(eu, 4) AS n_union,
       |  round(CAST(nboth AS DOUBLE) * eu / nv, 4) AS n_both,
       |  round(CAST(nonly AS DOUBLE) * eu / nv, 4) AS n_click_only
       |FROM est""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    val sp = s
    import sp.implicits._
    val k = 256
    val kmv = new SketchAggregators.BottomK(k)
    val sk = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(kmv.toColumn.name("sk"))
      .toDF("t", "sk")
    val both = sk.filter(col("t") === "click").select(col("sk").as("ska"))
      .crossJoin(sk.filter(col("t") === "purchase").select(col("sk").as("skb")))
    // 255 · (2³¹−1), the KMV estimate scale — matches the oracle literal
    val scale = 255.0 * 2147483647.0
    both
      .withColumn("u", slice(array_sort(array_distinct(
        concat(col("ska"), col("skb")))), 1, k))
      .withColumn("nv", size(col("u")))
      .withColumn("nboth",
        size(array_intersect(array_intersect(col("u"), col("ska")), col("skb"))))
      .withColumn("nonly",
        size(array_except(array_intersect(col("u"), col("ska")), col("skb"))))
      .withColumn("eu", when(col("nv") < k, col("nv").cast("double"))
        .otherwise(lit(scale) / element_at(col("u"), k).cast("double")))
      .select(round(col("eu"), 4).as("n_union"),
        round(col("nboth").cast("double") * col("eu") / col("nv"), 4).as("n_both"),
        round(col("nonly").cast("double") * col("eu") / col("nv"), 4).as("n_click_only"))
  }

  /** MULTI-SKETCH profile bundle — ONE scan, ONE groupBy, THREE
    * portable sketches per group: bottom-k distinct-count ([[
    * graft.functions.SketchAggregators.BottomK]]), HLL registers
    * ([[graft.functions.SketchAggregators.HllRegisters]] — two
    * independent distinct estimators cross-checking each other, the
    * profile-job practice) and the cents-exact histogram
    * ([[graft.functions.SketchAggregators.HistCounts]], p50 over
    * o_totalprice). This is the shape a daily 100 TB profile job
    * runs: all sketch partials accumulate in the SAME map-side
    * combine, and every derived statistic below is a zero-shuffle HOF
    * over the group's arrays. The oracle rebuilds all three sketch
    * arithmetics (their standalone keys' fragments, composed).
    *
    * @note scale: per (partition, group) state = 256 + 256 + 1024
    *   longs; one shuffle total for all three sketches. */
  private val aggSketchBundle = Q(
    "agg_sketch_bundle",
    s"""WITH kh AS (SELECT DISTINCT o_orderstatus AS g,
       |    ${graft.functions.SketchAggregators.BottomK.oHash("o_custkey")} AS h
       |  FROM orders),
       |ksk AS (SELECT g, h FROM (SELECT g, h,
       |          row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM kh)
       |        WHERE rk <= 256),
       |kmv AS (SELECT g, CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
       |                       ELSE round(547608329985.0 / CAST(max(h) AS DOUBLE), 4)
       |                  END AS kmv_distinct
       |        FROM ksk GROUP BY 1),
       |hh0 AS (SELECT o_orderstatus AS g,
       |    ${graft.functions.SketchAggregators.BottomK.oHash("o_custkey")} AS h0
       |  FROM orders),
       |hh AS (SELECT g, (h0 * h0 + h0) % 2147483647 AS h FROM hh0),
       |hbr AS (SELECT g, CAST(h % 256 AS INT) AS bucket,
       |    CASE WHEN h // 256 = 0 THEN 24 ELSE 24 - length(bin(h // 256)) END AS rho
       |  FROM hh),
       |hregs AS (SELECT g, bucket, max(rho) AS r FROM hbr GROUP BY 1, 2),
       |hll AS (SELECT g,
       |    CAST(sum(CAST(1 AS BIGINT) << CAST(24 - r AS INT)) +
       |         (256 - count(*)) * 16777216 AS BIGINT) AS hll_s_reg
       |  FROM hregs GROUP BY 1),
       |hb AS (SELECT o_orderstatus AS g,
       |    least(1023, (CAST(round(o_totalprice * 100) AS BIGINT) * 1024)
       |                // 60000000) AS bin
       |  FROM orders),
       |hc AS (SELECT g, bin, count(*) AS cnt FROM hb GROUP BY 1, 2),
       |hw AS (SELECT g, bin, cnt,
       |        sum(cnt) OVER (PARTITION BY g ORDER BY bin
       |                       ROWS UNBOUNDED PRECEDING) AS cum,
       |        sum(cnt) OVER (PARTITION BY g) AS n
       |      FROM hc),
       |hist AS (SELECT g, CAST(max(n) AS BIGINT) AS n_rows,
       |    CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bin END) + 1 AS DOUBLE)
       |      * 585.9375 AS p50_est
       |  FROM hw GROUP BY 1)
       |SELECT hist.g AS scope, hist.n_rows, kmv.kmv_distinct, hll.hll_s_reg,
       |  round((0.7213 / (1 + 1.079 / 256.0)) * 65536 * 16777216
       |        / CAST(hll.hll_s_reg AS DOUBLE), 4) AS hll_distinct,
       |  hist.p50_est
       |FROM hist JOIN kmv ON kmv.g = hist.g JOIN hll ON hll.g = hist.g
       |ORDER BY scope""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    import org.apache.spark.sql.Encoders
    val kmvU = udaf(new SketchAggregators.BottomK(256), Encoders.scalaLong)
    val hllU = udaf(new SketchAggregators.HllRegisters(8), Encoders.scalaLong)
    val histU = udaf(new SketchAggregators.HistCounts(1024, 60000000L),
      Encoders.scalaLong)
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus").as("scope"))
      .agg(count(lit(1)).as("n_rows"),
        kmvU(col("o_custkey")).as("kmv"),
        hllU(col("o_custkey")).as("hll"),
        histU(round(col("o_totalprice") * 100).cast("long")).as("hist"))
      .withColumn("kmv_distinct",
        when(size(col("kmv")) < 256, size(col("kmv")).cast("double"))
          .otherwise(round(lit(255.0 * 2147483647.0) /
            element_at(col("kmv"), 256).cast("double"), 4)))
      .withColumn("hll_s_reg", expr(
        "aggregate(hll, CAST(0 AS BIGINT), (acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), 24 - CAST(r AS INT)))"))
      .withColumn("hll_distinct",
        round(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) *
          lit(16777216.0) / col("hll_s_reg").cast("double"), 4))
      .withColumn("p50_bin", expr(
        """aggregate(hist,
          |  struct(CAST(0 AS BIGINT) AS cum, -1 AS bin, 0 AS idx),
          |  (acc, x) -> struct(acc.cum + x,
          |    IF(acc.bin >= 0, acc.bin,
          |       IF(acc.cum + x >= (n_rows + 1) div 2, acc.idx, -1)),
          |    acc.idx + 1),
          |  acc -> acc.bin)""".stripMargin))
      .withColumn("p50_est", (col("p50_bin") + 1).cast("double") * lit(585.9375))
      .select(col("scope"), col("n_rows"), col("kmv_distinct"),
        col("hll_s_reg"), col("hll_distinct"), col("p50_est"))
      .orderBy("scope")
  }

  /** Sketch ROLLUP THROUGH STORAGE — [[aggSketchBundle]]'s claim
    * ("per-epoch sketches roll up without re-reading history") made
    * literal: per-WEEK partial sketches (bottom-k KMV + HLL registers
    * + cents-exact histogram + row count) are computed once, WRITTEN
    * TO PARQUET, re-read as the stored profile table a warehouse
    * would keep, and merged — KMV by distinct-union + re-trim, HLL by
    * elementwise register max, histogram by elementwise count add,
    * all exact integer operations whose merge-of-partials equals the
    * direct global sketch BY CONSTRUCTION — into the whole-corpus
    * estimates. The oracle computes the global sketches straight from
    * base data, so the hash gate certifies that the storage roundtrip
    * + merge lose nothing: the incremental profile answer IS the
    * full-scan answer.
    *
    * @note scale: the only base-data pass is the one per-epoch
    *   groupBy (each epoch's job in production); the rollup reads
    *   |epochs| sketch rows of fixed size — history never re-scans.
    *   Merges are commutative/associative exact integer ops, so
    *   collect_list order and partitioning are immaterial. */
  private val aggSketchRollup = Q(
    "agg_sketch_rollup",
    s"""WITH kh AS (SELECT DISTINCT
       |    ${graft.functions.SketchAggregators.BottomK.oHash("o_custkey")} AS h
       |  FROM orders),
       |ksk AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk
       |         FROM kh) WHERE rk <= 256),
       |kmv AS (SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
       |                    ELSE round(547608329985.0 / CAST(max(h) AS DOUBLE), 4)
       |               END AS kmv_distinct
       |        FROM ksk),
       |hh0 AS (SELECT
       |    ${graft.functions.SketchAggregators.BottomK.oHash("o_custkey")} AS h0
       |  FROM orders),
       |hh AS (SELECT (h0 * h0 + h0) % 2147483647 AS h FROM hh0),
       |hbr AS (SELECT CAST(h % 256 AS INT) AS bucket,
       |    CASE WHEN h // 256 = 0 THEN 24 ELSE 24 - length(bin(h // 256)) END AS rho
       |  FROM hh),
       |hregs AS (SELECT bucket, max(rho) AS r FROM hbr GROUP BY 1),
       |hll AS (SELECT
       |    CAST(sum(CAST(1 AS BIGINT) << CAST(24 - r AS INT)) +
       |         (256 - count(*)) * 16777216 AS BIGINT) AS hll_s_reg
       |  FROM hregs),
       |hb AS (SELECT least(1023, (CAST(round(o_totalprice * 100) AS BIGINT) * 1024)
       |                // 60000000) AS bin
       |  FROM orders),
       |hc AS (SELECT bin, count(*) AS cnt FROM hb GROUP BY 1),
       |hw AS (SELECT bin, cnt,
       |        sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
       |        sum(cnt) OVER () AS n
       |      FROM hc),
       |hist AS (SELECT CAST(max(n) AS BIGINT) AS n_rows,
       |    CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bin END) + 1 AS DOUBLE)
       |      * 585.9375 AS p50_est
       |  FROM hw)
       |SELECT 'ALL' AS scope, hist.n_rows, kmv.kmv_distinct, hll.hll_s_reg,
       |  round((0.7213 / (1 + 1.079 / 256.0)) * 65536 * 16777216
       |        / CAST(hll.hll_s_reg AS DOUBLE), 4) AS hll_distinct,
       |  hist.p50_est
       |FROM hist CROSS JOIN kmv CROSS JOIN hll""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    import org.apache.spark.sql.Encoders
    val kmvU = udaf(new SketchAggregators.BottomK(256), Encoders.scalaLong)
    val hllU = udaf(new SketchAggregators.HllRegisters(8), Encoders.scalaLong)
    val histU = udaf(new SketchAggregators.HistCounts(1024, 60000000L),
      Encoders.scalaLong)
    val store = graft.Scratch.dirString("graft-sketch-store")
    // epoch jobs: one bounded sketch row per week, persisted
    Tables.orders(s, d)
      .groupBy(expr("datediff(o_orderdate, DATE '1995-01-01') div 7").as("wk"))
      .agg(count(lit(1)).as("n_rows"),
        kmvU(col("o_custkey")).as("kmv"),
        hllU(col("o_custkey")).as("hll"),
        histU(round(col("o_totalprice") * 100).cast("long")).as("hist"))
      .write.mode("overwrite").parquet(store)
    // the rollup job: reads ONLY the stored profile table
    s.read.parquet(store)
      .agg(sum("n_rows").as("n_rows"),
        expr("slice(array_sort(array_distinct(flatten(collect_list(kmv)))), 1, 256)")
          .as("kmv"),
        expr("""aggregate(collect_list(hll),
          |  array_repeat(CAST(0 AS BIGINT), 256),
          |  (acc, x) -> zip_with(acc, x, (a, b) -> greatest(a, b)))""".stripMargin)
          .as("hll"),
        expr("""aggregate(collect_list(hist),
          |  array_repeat(CAST(0 AS BIGINT), 1024),
          |  (acc, x) -> zip_with(acc, x, (a, b) -> a + b))""".stripMargin)
          .as("hist"))
      .withColumn("kmv_distinct",
        when(size(col("kmv")) < 256, size(col("kmv")).cast("double"))
          .otherwise(round(lit(255.0 * 2147483647.0) /
            element_at(col("kmv"), 256).cast("double"), 4)))
      .withColumn("hll_s_reg", expr(
        "aggregate(hll, CAST(0 AS BIGINT), (acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), 24 - CAST(r AS INT)))"))
      .withColumn("hll_distinct",
        round(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) *
          lit(16777216.0) / col("hll_s_reg").cast("double"), 4))
      .withColumn("p50_bin", expr(
        """aggregate(hist,
          |  struct(CAST(0 AS BIGINT) AS cum, -1 AS bin, 0 AS idx),
          |  (acc, x) -> struct(acc.cum + x,
          |    IF(acc.bin >= 0, acc.bin,
          |       IF(acc.cum + x >= (n_rows + 1) div 2, acc.idx, -1)),
          |    acc.idx + 1),
          |  acc -> acc.bin)""".stripMargin))
      .withColumn("p50_est", (col("p50_bin") + 1).cast("double") * lit(585.9375))
      .select(lit("ALL").as("scope"), col("n_rows"), col("kmv_distinct"),
        col("hll_s_reg"), col("hll_distinct"), col("p50_est"))
  }

  /** RETENTION MATRIX from KMV sketch algebra — the oracle-verified
    * twin of [[aggThetaRetention]]: one bottom-k sketch of active users
    * per week, then every `(week_a ≤ week_b)` pair's co-active count
    * from the [[aggKmvSetops]] intersection estimator (combined
    * bottom-k of the two retained sets; membership below both k-th
    * minima is exact; one IEEE division + scaling). Below k distincts
    * per pair union the whole matrix degenerates to exact counts —
    * which the sf0.01 fixture exercises — while the estimator regime is
    * spec-gated in `KmvSetopsSpec`. No re-scan of base data: the
    * matrix is |weeks|² array-math cells over the per-week sketches.
    *
    * @note scale: the only data-sized work is one groupBy building the
    *   per-week sketches (≤ k longs each); the pairwise algebra is
    *   |weeks|² bounded-array rows — metadata, however many events. */
  private val aggKmvRetention = Q(
    "agg_kmv_retention",
    s"""WITH wh AS (SELECT DISTINCT
       |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk,
       |    ${graft.functions.SketchAggregators.BottomK.oHash("user_id")} AS h
       |  FROM events),
       |sk AS (SELECT wk, h FROM (SELECT wk, h,
       |         row_number() OVER (PARTITION BY wk ORDER BY h) AS rk FROM wh)
       |       WHERE rk <= 256),
       |pairs AS (SELECT a.wk AS wk_a, b.wk AS wk_b
       |          FROM (SELECT DISTINCT wk FROM sk) a
       |          JOIN (SELECT DISTINCT wk FROM sk) b ON a.wk <= b.wk),
       |u AS (SELECT wk_a, wk_b, h FROM (
       |        SELECT p.wk_a, p.wk_b, s.h,
       |               row_number() OVER (PARTITION BY p.wk_a, p.wk_b
       |                                  ORDER BY s.h) AS rk
       |        FROM pairs p JOIN (SELECT DISTINCT wk, h FROM sk) s
       |          ON s.wk = p.wk_a OR s.wk = p.wk_b
       |        GROUP BY p.wk_a, p.wk_b, s.h)
       |      WHERE rk <= 256),
       |st AS (SELECT u.wk_a, u.wk_b, count(*) AS nv, max(u.h) AS hk,
       |         sum(CASE WHEN EXISTS (SELECT 1 FROM sk x
       |                               WHERE x.wk = u.wk_a AND x.h = u.h)
       |                   AND EXISTS (SELECT 1 FROM sk y
       |                               WHERE y.wk = u.wk_b AND y.h = u.h)
       |              THEN 1 ELSE 0 END) AS nboth
       |       FROM u GROUP BY 1, 2),
       |est AS (SELECT wk_a, wk_b, nv, nboth,
       |    CASE WHEN nv < 256 THEN CAST(nv AS DOUBLE)
       |         ELSE 547608329985.0 / CAST(hk AS DOUBLE) END AS eu
       |  FROM st)
       |SELECT CAST(wk_a AS BIGINT) AS wk_a, CAST(wk_b AS BIGINT) AS wk_b,
       |  round(CAST(nboth AS DOUBLE) * eu / nv, 4) AS n_both
       |FROM est ORDER BY wk_a, wk_b""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    val sp = s
    import sp.implicits._
    val k = 256
    val kmv = new SketchAggregators.BottomK(k)
    val byWk = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 604800000000").as("wk"), col("user_id"))
      .as[(Long, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(kmv.toColumn.name("sk"))
      .toDF("wk", "sk")
      .persist() // both sides of the week×week matrix
    val scale = 255.0 * 2147483647.0
    byWk.select(col("wk").as("wk_a"), col("sk").as("ska"))
      .join(byWk.select(col("wk").as("wk_b"), col("sk").as("skb")),
        col("wk_a") <= col("wk_b"))
      .withColumn("u", slice(array_sort(array_distinct(
        concat(col("ska"), col("skb")))), 1, k))
      .withColumn("nv", size(col("u")))
      .withColumn("nboth",
        size(array_intersect(array_intersect(col("u"), col("ska")), col("skb"))))
      .withColumn("eu", when(col("nv") < k, col("nv").cast("double"))
        .otherwise(lit(scale) / element_at(col("u"), k).cast("double")))
      .select(col("wk_a"), col("wk_b"),
        round(col("nboth").cast("double") * col("eu") / col("nv"), 4).as("n_both"))
      .orderBy("wk_a", "wk_b")
  }

  /** PORTABLE HyperLogLog rollup
    * ([[graft.functions.SketchAggregators.HllRegisters]]) — the same
    * per-group/merged-ALL shape as [[aggHllMergeable]], but with HLL's
    * OWN register arithmetic rebuilt by the oracle: bucket/rho over the
    * shared 31-bit hash, registers as exact BIGINTs
    * (`S = Σ 2^(24−r)`, zero count), and the raw Flajolet estimate
    * `α·m²·2²⁴/S` as pure IEEE mul/div — every column hash-checked,
    * moving the HLL capability itself off the rows-only list (the
    * DataSketches twin stays rows-only for its engine-specific HIP
    * path). The ALL row derives from the per-group sketches by
    * elementwise max — the merge is what is being verified.
    *
    * @note scale: 256 ints per (partition, group); the ALL merge
    *   explodes |groups|·256 rows once — metadata-sized at any corpus
    *   size. */
  private val aggHllPortable = Q(
    "agg_hll_portable",
    s"""WITH h0 AS (SELECT o_orderstatus AS g,
       |    ${graft.functions.SketchAggregators.BottomK.oHash("o_custkey")} AS h0
       |  FROM orders),
       |h AS (SELECT g, (h0 * h0 + h0) % 2147483647 AS h FROM h0),
       |br AS (SELECT g, CAST(h % 256 AS INT) AS bucket,
       |    CASE WHEN h // 256 = 0 THEN 24 ELSE 24 - length(bin(h // 256)) END AS rho
       |  FROM h),
       |regs AS (SELECT g, bucket, max(rho) AS r FROM br GROUP BY 1, 2),
       |pagg AS (SELECT g AS scope,
       |    CAST(sum(CAST(1 AS BIGINT) << CAST(24 - r AS INT)) +
       |         (256 - count(*)) * 16777216 AS BIGINT) AS s_reg,
       |    CAST(256 - count(*) AS BIGINT) AS v_zero
       |  FROM regs GROUP BY 1),
       |aregs AS (SELECT bucket, max(rho) AS r FROM br GROUP BY 1),
       |aagg AS (SELECT 'ALL' AS scope,
       |    CAST(sum(CAST(1 AS BIGINT) << CAST(24 - r AS INT)) +
       |         (256 - count(*)) * 16777216 AS BIGINT) AS s_reg,
       |    CAST(256 - count(*) AS BIGINT) AS v_zero
       |  FROM aregs),
       |u AS (SELECT * FROM pagg UNION ALL SELECT * FROM aagg)
       |SELECT scope, s_reg, v_zero,
       |  round((0.7213 / (1 + 1.079 / 256.0)) * 65536 * 16777216
       |        / CAST(s_reg AS DOUBLE), 4) AS est_distinct
       |FROM u ORDER BY scope""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    val sp = s
    import sp.implicits._
    val hll = new SketchAggregators.HllRegisters(8)
    val per = Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_custkey"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(hll.toColumn.name("regs"))
      .toDF("g", "regs")
      .persist() // feeds the per-group rows AND the ALL merge
    val ex = per.select(col("g"), posexplode(col("regs")))
      .toDF("g", "bucket", "r")
    val perRows = ex.select(col("g").as("scope"), col("bucket"), col("r"))
    // merged ALL sketch = elementwise max of the per-group registers
    val allRows = ex.groupBy("bucket").agg(max(col("r")).as("r"))
      .select(lit("ALL").as("scope"), col("bucket"), col("r"))
    perRows.unionByName(allRows)
      .groupBy("scope")
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 24 - CAST(r AS INT))")).as("s_reg"),
        sum(when(col("r") === 0, 1L).otherwise(0L)).as("v_zero"))
      .select(col("scope"), col("s_reg"), col("v_zero"),
        round(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) *
          lit(16777216.0) / col("s_reg").cast("double"), 4).as("est_distinct"))
      .orderBy("scope")
  }

  /** Theta-sketch SET OPERATIONS on distinct counts (Spark 4.1
    * DataSketches builtins) — the capability HLL cannot provide:
    * "distinct users who clicked AND purchased / clicked but never
    * purchased" from two independently-built sketches, no re-scan, no
    * exact join. Audience-overlap / retention style analyses at 100 TB
    * keep one theta sketch per (segment, day) and answer arbitrary
    * ∪/∩/∖ combinations from sketch algebra alone. One scan builds
    * both sketches (conditional agg). Rows-only: sketch estimates are
    * engine-specific; `ThetaTopkSpec` gates all three against exact.
    *
    * @note scale: fixed-size sketches, associative merges — same
    *   incremental-rollup economics as [[aggHllMergeable]], plus the
    *   intersection/difference algebra. */
  private val aggThetaSetops = Q.noOracle("agg_theta_setops") { (s, d) =>
    Tables.events(s, d)
      .agg(
        expr("theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)")
          .as("c"),
        expr("theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)")
          .as("p"))
      .select(
        expr("theta_sketch_estimate(theta_union(c, p))").as("n_union"),
        expr("theta_sketch_estimate(theta_intersection(c, p))").as("n_both"),
        expr("theta_sketch_estimate(theta_difference(c, p))").as("n_click_only"))
  }

  /** Retention matrix from THETA SKETCH ALGEBRA alone (r5): one theta
    * sketch of active users per week, then every (week_a ≤ week_b)
    * pair's co-active user count estimated via `theta_intersection` —
    * no re-scan of base data, no exact user-level join. This is how a
    * 100 TB corpus answers arbitrary audience-overlap / retention
    * questions: persist one fixed-size sketch per (segment, period)
    * and combine them pairwise at query time; the exact twin
    * (`agg_cohort_retention`) needs the full user×week distinct set
    * every time. `ThetaTopkSpec` gates every cell against the exact
    * pairwise overlap.
    *
    * @note scale: the matrix is periods² cells of constant-size sketch
    *   merges — independent of row count; the only data-sized work is
    *   the one groupBy building the per-period sketches. */
  private val aggThetaRetention = Q.noOracle("agg_theta_retention") { (s, d) =>
    val byWk = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 604800000000").as("wk"), col("user_id"))
      .groupBy("wk").agg(expr("theta_sketch_agg(user_id)").as("sk"))
    val a = byWk.select(col("wk").as("wk_a"), col("sk").as("sk_a"))
    val b = byWk.select(col("wk").as("wk_b"), col("sk").as("sk_b"))
    a.join(b, col("wk_a") <= col("wk_b"))
      .select(col("wk_a"), col("wk_b"),
        expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
          .as("n_both"))
      .orderBy("wk_a", "wk_b")
  }

  /** Per-window mergeable heavy hitters (r5): `approx_top_k` sketches
    * per tumbling hour — the windowed face of [[aggTopkMergeable]].
    * Each hour's sketch accumulates independently (partial states
    * merge associatively across partitions), so the same shape runs as
    * a watermarked streaming agg; the estimate step is a per-window
    * finalize. Rows-only (sketch output); `ThetaTopkSpec` pins every
    * reported (window, user, count) against the exact hourly counts
    * and the count-multiset against the exact hourly top-3.
    *
    * @note scale: state per window = one bounded sketch, not the
    *   per-user count map the exact [[graft.streaming.StreamOps
    *   .windowTopN]] carries — the trade a 1000-executor deployment
    *   makes when per-window cardinality explodes. */
  private val streamTopkWindow = Q.noOracle("stream_topk_window") { (s, d) =>
    Tables.events(s, d)
      .groupBy(expr("unix_micros(ts) - unix_micros(ts) % 3600000000")
        .as("ws_us"))
      .agg(expr("approx_top_k_estimate(approx_top_k_accumulate(user_id, 1024), 3)")
        .as("top"))
      .select(col("ws_us"), posexplode(col("top")).as(Seq("rnk0", "t")))
      .select(col("ws_us"), col("t.item").as("user_id"),
        col("t.count").as("n"), (col("rnk0") + 1).cast("int").as("rnk"))
      .orderBy("ws_us", "rnk")
  }

  /** Mergeable heavy-hitters rollup (Spark 4.1 `approx_top_k_*`): per
    * event_type top-k ACCUMULATE states, combined into the global
    * top-5 users without re-reading base data — the frequent-items
    * twin of [[aggHllMergeable]]/[[aggKllMergeable]], and the
    * incremental form of the exact `llm_topk_heavy` key. Rows-only;
    * `ThetaTopkSpec` pins the combined estimate against the exact
    * global counts.
    *
    * @note scale: state is maxItemsTracked entries per partition
    *   sketch; combine is associative. */
  private val aggTopkMergeable = Q.noOracle("agg_topk_mergeable") { (s, d) =>
    val sk = Tables.events(s, d)
      .groupBy("event_type")
      .agg(expr("approx_top_k_accumulate(user_id, 4096)").as("st"))
    sk.agg(expr("approx_top_k_estimate(approx_top_k_combine(st, 4096), 5)").as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.item").as("user_id"), col("t.count").as("n"))
  }

  private val cmsConstsSql =
    """consts(i, a, b) AS (VALUES
      |    (0, 1000000007, 12345), (1, 998244353, 67891),
      |    (2, 786433, 13579), (3, 104857601, 24680))""".stripMargin

  /** The 4 CMS hash-row constants as a broadcastable frame — shared by
    * the portable heavy-hitter keys' declarative probe stage. */
  private def cmsConstsDf(s: org.apache.spark.sql.SparkSession) = {
    val sp = s
    import sp.implicits._
    Seq((0, 1000000007L, 12345L), (1, 998244353L, 67891L),
      (2, 786433L, 13579L), (3, 104857601L, 24680L)).toDF("i", "a", "b")
  }

  /** PORTABLE heavy hitters — the oracle-verified twin of
    * [[aggTopkMergeable]]'s DataSketches `approx_top_k`: the classic
    * sketch+candidates composition (Cormode & Muthukrishnan's CMS
    * paper pairs the sketch with a heap of candidates; here the
    * candidate set is DETERMINISTIC so the whole path is
    * reproducible). Frequencies come from the MERGED per-event_type
    * [[graft.functions.SketchAggregators.CountMin]] sketches — the
    * mergeable half a 100 TB deployment rolls up across epochs without
    * re-reading history — and the candidate set is the exact current-
    * scan counts at threshold 75 (bounded output: the threshold prunes
    * in the map-side combine). Top-5 by (CMS estimate DESC, user_id):
    * every internal is exact integer arithmetic, so the DuckDB oracle
    * rebuilds the counters, the candidate set, the estimates AND the
    * ranking — `hash_match` where `agg_topk_mergeable` can only be
    * rows-only. `est_n ≥ n_exact` by the CMS overcount property
    * (`CmsVariantsSpec` pins it).
    *
    * @note scale: sketch state is depth·width longs per group however
    *   many rows stream in; candidate generation is one map-side-
    *   combined groupBy pruned by the threshold; the probe stage joins
    *   |candidates|·depth rows against the depth·width merged table —
    *   metadata-sized at any corpus scale. */
  private val aggTopkPortable = Q(
    "agg_topk_portable",
    s"""WITH $cmsConstsSql,
       |per AS (SELECT c.i,
       |    ((CAST(c.a AS BIGINT) * (e.user_id % 2147483647) + c.b) % 2147483647) % 2048 AS cell,
       |    count(*) AS n
       |  FROM events e CROSS JOIN consts c GROUP BY 1, 2),
       |cand AS (SELECT user_id, count(*) AS n_exact FROM events
       |         GROUP BY 1 HAVING count(*) >= 75),
       |pc AS (SELECT cand.user_id, cand.n_exact, c.i,
       |    ((CAST(c.a AS BIGINT) * (cand.user_id % 2147483647) + c.b) % 2147483647) % 2048 AS cell
       |  FROM cand CROSS JOIN consts c),
       |est AS (SELECT user_id, n_exact,
       |    CAST(min(COALESCE(per.n, 0)) AS BIGINT) AS est_n
       |  FROM pc LEFT JOIN per ON per.i = pc.i AND per.cell = pc.cell
       |  GROUP BY 1, 2),
       |r AS (SELECT user_id, n_exact, est_n,
       |    row_number() OVER (ORDER BY est_n DESC, user_id) AS rnk FROM est)
       |SELECT user_id, n_exact, est_n, CAST(rnk AS INT) AS rnk
       |FROM r WHERE rnk <= 5 ORDER BY rnk""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    val sp = s
    import sp.implicits._
    val width = 2048
    val M = SketchAggregators.CountMin.M
    val cms = new SketchAggregators.CountMin(4, width)
    val per = Tables.events(s, d)
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(cms.toColumn.name("sk"))
      .toDF("event_type", "sk")
    val merged = per
      .select(posexplode(col("sk")).as(Seq("pos", "cnt")))
      .groupBy("pos").agg(sum("cnt").as("cnt"))
    val cand = Tables.events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") >= 75)
    val pc = cand.crossJoin(broadcast(cmsConstsDf(s)))
      .withColumn("pos", col("i") * width +
        pmod(pmod(col("a") * pmod(col("user_id"), lit(M)) + col("b"), lit(M)),
          lit(width.toLong)))
    val est = pc.join(merged, "pos")
      .groupBy("user_id", "n_exact").agg(min("cnt").as("est_n"))
    val w = Window.orderBy(col("est_n").desc, col("user_id"))
    est.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 5)
      .select(col("user_id"), col("n_exact"), col("est_n"), col("rnk"))
      .orderBy("rnk")
  }

  /** [[aggTopkPortable]] PER TUMBLING WINDOW — the hash-verified twin
    * of the rows-only [[streamTopkWindow]]: per-day
    * [[graft.functions.SketchAggregators.CountMin]] sketches (the
    * window is the merge unit — partials combine associatively, so the
    * identical shape runs as a watermarked streaming agg) composed
    * with per-window deterministic candidates (exact in-window count
    * ≥ 4) and ranked top-3 per window by (estimate DESC, user_id).
    * Width 256 — narrow enough that the sketch, not the exact counts,
    * is doing the answering at production cardinalities — and every
    * step integer-exact, so the oracle rebuilds sketch, candidates,
    * estimates and ranks per window.
    *
    * @note scale: state per window = one depth·width counter block +
    *   the threshold-pruned candidate heap — the trade
    *   [[streamTopkWindow]] makes, now engine-portable; the probe join
    *   is |windows|·|candidates|·depth rows. */
  private val streamTopkWindowPortable = Q(
    "stream_topk_window_portable",
    s"""WITH $cmsConstsSql,
       |ev AS (SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS ws_us, user_id
       |       FROM events),
       |per AS (SELECT e.ws_us, c.i,
       |    ((CAST(c.a AS BIGINT) * (e.user_id % 2147483647) + c.b) % 2147483647) % 256 AS cell,
       |    count(*) AS n
       |  FROM ev e CROSS JOIN consts c GROUP BY 1, 2, 3),
       |cand AS (SELECT ws_us, user_id, count(*) AS n_exact FROM ev
       |         GROUP BY 1, 2 HAVING count(*) >= 4),
       |pc AS (SELECT cand.ws_us, cand.user_id, cand.n_exact, c.i,
       |    ((CAST(c.a AS BIGINT) * (cand.user_id % 2147483647) + c.b) % 2147483647) % 256 AS cell
       |  FROM cand CROSS JOIN consts c),
       |est AS (SELECT pc.ws_us, user_id, n_exact,
       |    CAST(min(COALESCE(per.n, 0)) AS BIGINT) AS est_n
       |  FROM pc LEFT JOIN per ON per.ws_us = pc.ws_us AND per.i = pc.i
       |    AND per.cell = pc.cell
       |  GROUP BY 1, 2, 3),
       |r AS (SELECT ws_us, user_id, n_exact, est_n,
       |    row_number() OVER (PARTITION BY ws_us
       |      ORDER BY est_n DESC, user_id) AS rnk FROM est)
       |SELECT ws_us, user_id, n_exact, est_n, CAST(rnk AS INT) AS rnk
       |FROM r WHERE rnk <= 3 ORDER BY ws_us, rnk""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    val sp = s
    import sp.implicits._
    val width = 256
    val M = SketchAggregators.CountMin.M
    val cms = new SketchAggregators.CountMin(4, width)
    val evd = Tables.events(s, d)
      .select(expr("unix_micros(ts) - unix_micros(ts) % 86400000000").as("ws_us"),
        col("user_id"))
    val per = evd.as[(Long, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(cms.toColumn.name("sk"))
      .toDF("ws_us", "sk")
    val cells = per.select(col("ws_us"), posexplode(col("sk")).as(Seq("pos", "cnt")))
    val cand = evd.groupBy("ws_us", "user_id")
      .agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") >= 4)
    val pc = cand.crossJoin(broadcast(cmsConstsDf(s)))
      .withColumn("pos", col("i") * width +
        pmod(pmod(col("a") * pmod(col("user_id"), lit(M)) + col("b"), lit(M)),
          lit(width.toLong)))
    val est = pc.join(cells, Seq("ws_us", "pos"))
      .groupBy("ws_us", "user_id", "n_exact").agg(min("cnt").as("est_n"))
    val w = Window.partitionBy("ws_us").orderBy(col("est_n").desc, col("user_id"))
    est.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 3)
      .select(col("ws_us"), col("user_id"), col("n_exact"), col("est_n"), col("rnk"))
      .orderBy("ws_us", "rnk")
  }

  /** PORTABLE DISTINCT COUNTS PER TUMBLING WINDOW — the windowed form
    * of [[aggKmvMergeable]], completing the per-window portable sketch
    * family next to [[streamTopkWindowPortable]]: per-day
    * [[graft.functions.SketchAggregators.BottomK]] KMV sketches (the
    * bottom-k set is the merge unit — union + re-trim is associative,
    * so the identical shape runs as a watermarked streaming agg), the
    * k-th-minimum estimator as one IEEE division, and EXACT counts
    * whenever a window holds fewer than k distinct users (the
    * degenerate regime — KMV's advantage over HLL here: daily windows
    * sit at hundreds of users where raw HLL is in its small-range
    * bias regime, while KMV is simply exact). Every step cross-engine
    * arithmetic, so the oracle rebuilds the per-window bottom-k sets
    * and both estimator branches — `hash_match` where a DataSketches
    * windowed approx-distinct could only be rows-only.
    *
    * @note scale: state per window is ≤ k hashes however many events
    *   stream in — the daily-active-users shape a 100 TB deployment
    *   keeps per (segment, day) and rolls up across days by
    *   union+trim without re-reading history; above k distinct the
    *   estimator's relative error is ~1/√(k−1) ≈ 6%. */
  private val streamDistinctWindowPortable = Q(
    "stream_distinct_window_portable",
    s"""WITH ev AS (SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS ws_us, user_id
       |           FROM events),
       |h AS (SELECT DISTINCT ws_us,
       |    ${graft.functions.SketchAggregators.BottomK.oHash("user_id")} AS h
       |  FROM ev),
       |rk AS (SELECT ws_us, h,
       |    row_number() OVER (PARTITION BY ws_us ORDER BY h) AS rk
       |  FROM h),
       |sk AS (SELECT ws_us, h FROM rk WHERE rk <= 256)
       |SELECT ws_us,
       |  CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
       |       ELSE round(547608329985.0 / CAST(max(h) AS DOUBLE), 4)
       |  END AS est_distinct
       |FROM sk GROUP BY 1 ORDER BY ws_us""".stripMargin) { (s, d) =>
    import graft.functions.SketchAggregators
    val sp = s
    import sp.implicits._
    val k = 256
    val kmv = new SketchAggregators.BottomK(k)
    // 255 · (2³¹−1) — exact below 2⁵³, matching the oracle's literal
    val scale = 255.0 * 2147483647.0
    Tables.events(s, d)
      .select(expr("unix_micros(ts) - unix_micros(ts) % 86400000000").as("ws_us"),
        col("user_id"))
      .as[(Long, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(kmv.toColumn.name("sk"))
      .toDF("ws_us", "sk")
      .select(col("ws_us"),
        when(size(col("sk")) < k, size(col("sk")).cast("double"))
          .otherwise(round(lit(scale) / element_at(col("sk"), k).cast("double"), 4))
          .as("est_distinct"))
      .orderBy("ws_us")
  }

  /** PORTABLE QUANTILES PER TUMBLING WINDOW — the windowed form of
    * [[aggHistMergeable]], completing the per-window portable sketch
    * trio (heavy hitters [[streamTopkWindowPortable]], distinct counts
    * [[streamDistinctWindowPortable]], now quantiles): per-day
    * cents-exact 1024-bin histograms over the documented [0, 600)
    * value domain (`bin = (round(v·100)·1024) div 60000` — pure
    * integer arithmetic; per-bin counts merge by ADDITION, so the
    * window is the merge unit and the identical shape runs as a
    * watermarked streaming agg), p50/p95 read off as the upper edge of
    * the bin reaching `⌈p·n⌉`. The bin width 600/1024 = 75/128 is an
    * exact dyadic, so even the double outputs are bit-deterministic
    * and the oracle rebuilds bins, cumulative ranks and both
    * estimates per window. Honest error: one bin width (0.586).
    *
    * @note scale: ≤ 1024 longs per (partition, window) however many
    *   events stream in — the per-(segment, day) latency-percentile
    *   shape, rolled up across days by count addition without
    *   re-reading history. */
  private val streamHistWindowPortable = Q(
    "stream_hist_window_portable",
    """WITH ev AS (SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS ws_us,
      |       least(1023, (CAST(round(value * 100) AS BIGINT) * 1024) // 60000) AS bin
      |     FROM events),
      |c AS (SELECT ws_us, bin, count(*) AS cnt FROM ev GROUP BY 1, 2),
      |w AS (SELECT ws_us, bin, cnt,
      |        sum(cnt) OVER (PARTITION BY ws_us ORDER BY bin
      |                       ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(cnt) OVER (PARTITION BY ws_us) AS n
      |      FROM c)
      |SELECT ws_us, CAST(max(n) AS BIGINT) AS n_rows,
      |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bin END) + 1 AS DOUBLE)
      |    * 0.5859375 AS p50_est,
      |  CAST(min(CASE WHEN cum >= (95 * n + 99) // 100 THEN bin END) + 1 AS DOUBLE)
      |    * 0.5859375 AS p95_est
      |FROM w GROUP BY ws_us ORDER BY ws_us""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val binned = Tables.events(s, d)
      .select(expr("unix_micros(ts) - unix_micros(ts) % 86400000000").as("ws_us"),
        least(lit(1023L),
          expr("(CAST(round(value * 100) AS BIGINT) * 1024) div 60000")).as("bin"))
    val cnts = binned.groupBy("ws_us", "bin").agg(count(lit(1)).as("cnt"))
    cnts
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("ws_us")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("ws_us"))))
      .groupBy("ws_us")
      .agg(max(col("n")).as("n_rows"),
        ((min(when(col("cum") >= expr("(n + 1) div 2"), col("bin"))) + 1)
          .cast("double") * lit(0.5859375)).as("p50_est"),
        ((min(when(col("cum") >= expr("(95 * n + 99) div 100"), col("bin"))) + 1)
          .cast("double") * lit(0.5859375)).as("p95_est"))
      .orderBy("ws_us")
  }

  /** Boolean aggregates (ALL/ANY predicates per group). */
  private val aggBool = Q(
    "agg_bool",
    """SELECT l_returnflag,
      |  bool_and(l_quantity < 50) AS all_small,
      |  bool_or(l_discount > 0.09) AS any_deep_discount,
      |  bool_and(l_extendedprice > 0) AS all_positive
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(bool_and(col("l_quantity") < 50).as("all_small"),
        bool_or(col("l_discount") > 0.09).as("any_deep_discount"),
        bool_and(col("l_extendedprice") > 0).as("all_positive"))
      .orderBy("l_returnflag")
  }

  /** Last-observation-carried-forward via IGNORE NULLS window: every
    * event carries its user's most recent purchase value (NULL until
    * the first purchase) — the per-event LOCF shape, complementing the
    * hourly-scaffold `state_forward_fill`. */
  private val windowLocf = Q(
    "window_locf_fill",
    """SELECT user_id, event_id,
      |  last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
      |FROM (SELECT user_id, event_id, ts,
      |        CASE WHEN event_type = 'purchase' THEN value END AS pv
      |      FROM events)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "purchase", col("value")).as("pv"))
      .select(col("user_id"), col("event_id"),
        last(col("pv"), ignoreNulls = true).over(w)
          .as("last_purchase_value"))
      .orderBy("user_id", "event_id")
  }

  // ------------------------------------------------------- async enrich
  /** Flink Async-I/O enrichment ([[graft.operators.EnrichOps
    * .asyncEnrich]]): every event enriched through the bounded-
    * concurrency ordered async pipeline against a keyed lookup service
    * (here a broadcast map standing in for the KV store — the container
    * has no external service; the operator's concurrency/order/timeout
    * machinery is the real path and is latency-tested in
    * `EnrichOpsSpec`). Ordered-wait semantics make the result equal the
    * plain left join, which is exactly what the oracle runs.
    *
    * @note scale: the broadcast map is the *test* service — bounded by
    *   [[graft.operators.EnrichOps.boundedLookupMap]]'s explicit cap,
    *   so a 100× dimension fails loudly instead of OOMing the driver;
    *   in production `fetch` calls the remote store and the collect
    *   disappears. Concurrency is per task (see EnrichOps scaladoc). */
  private val enrichAsync = Q(
    "enrich_async",
    """SELECT e.event_id, e.user_id, c.c_mktsegment AS segment
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val dim: Map[Long, String] = graft.operators.EnrichOps.boundedLookupMap(
      Tables.customer(s, d), "c_custkey", "c_mktsegment")
    val bc = s.sparkContext.broadcast(dim)
    val ds = Tables.events(s, d)
      .select(col("event_id"), col("user_id")).as[(Long, Long)]
    graft.operators.EnrichOps.asyncEnrich(ds, concurrency = 8) { t =>
      (t._1, t._2, bc.value.getOrElse(t._2, null.asInstanceOf[String]))
    }.toDF("event_id", "user_id", "segment").orderBy("event_id")
  }

  val all: Seq[Q] = Seq(windowCountBased, cogroupTyped, aggCube, aggGroupingSets,
    joinAsofNative, aggPivot, flatmapPosexplode, windowNth, cdcUpsertLatest,
    cdcSnapshotDiff, stateMaxStreak, cdcScd2, stateMergeIntervals,
    windowPercentRank, aggUnpivot, joinAsofForward, aggCohortRetention,
    windowZscore, windowEwma, windowEwmaLong, windowEwmaAlpha, aggMode, aggCovar, aggCorr, cdcApplyChangelog, stateSessionIds,
    aggStringConcat, windowTimeRange, joinAsofTolerance, cdcMergeNewer,
    aggApproxDistinct, aggApproxQuantile, aggHllMergeable, aggKllMergeable,
    aggThetaSetops, aggTopkMergeable, aggTopkPortable, aggThetaRetention,
    streamTopkWindow, streamTopkWindowPortable,
    streamDistinctWindowPortable, streamHistWindowPortable,
    aggBool, windowLocf, enrichAsync, aggGapFill, stateSessionCapped,
    aggCmsMergeable, aggCmsMeanmin, aggKmvMergeable, aggHllPortable,
    aggKmvSetops, aggHistMergeable, aggKmvRetention, aggSketchBundle,
    aggSketchRollup)
}
