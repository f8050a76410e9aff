package graft.queries

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Source/sink format round-trips (SURVEY.md §2.1 S1/S5): prove the
  * engine reads and writes more than parquet by piping a table through
  * CSV / JSON-lines on disk and aggregating the re-read copy. The DuckDB
  * oracle aggregates the original parquet directly, so any loss in the
  * round-trip (quoting, type inference, precision) breaks the hash.
  *
  * @note scale: both writers shard naturally (one file per partition);
  *   the explicit read schema skips Spark's whole-file inference pass,
  *   which on a 100 TB lake would be a full extra scan. CSV/JSON scans
  *   are row-oriented and ~5-10x slower than parquet at scale — these
  *   formats are for interchange edges, not for the hot path.
  */
object SourceQueries {

  private def tmp(name: String): String =
    s"${graft.Scratch.root}/graft_roundtrip/$name"

  private val csvRoundtrip = Q(
    "source_csv_roundtrip",
    """SELECT n_regionkey, count(*) AS n,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
      |  max(n_name) AS max_name
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, d) =>
    val nat = Tables.nation(s, d)
    val dir = tmp(s"csv_${d.replaceAll("[^0-9.]", "")}")
    nat.write.mode("overwrite").option("header", "true").csv(dir)
    s.read.schema(nat.schema).option("header", "true").csv(dir)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), sum("n_nationkey").as("sum_key"),
        max("n_name").as("max_name"))
      .orderBy("n_regionkey")
  }

  private val jsonRoundtrip = Q(
    "source_json_roundtrip",
    s"""SELECT s_nationkey, count(*) AS n, ${Det.osum("s_acctbal")} AS bal
       |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, d) =>
    val sup = Tables.supplier(s, d)
    val dir = tmp(s"json_${d.replaceAll("[^0-9.]", "")}")
    sup.write.mode("overwrite").json(dir)
    s.read.schema(sup.schema).json(dir)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"), Det.dsum(col("s_acctbal")).as("bal"))
      .orderBy("s_nationkey")
  }

  private val orcRoundtrip = Q(
    "source_orc_roundtrip",
    s"""SELECT c_mktsegment, count(*) AS n, ${Det.osum("c_acctbal")} AS bal
       |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val dir = tmp(s"orc_${d.replaceAll("[^0-9.]", "")}")
    cust.write.mode("overwrite").orc(dir)
    s.read.schema(cust.schema).orc(dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), Det.dsum(col("c_acctbal")).as("bal"))
      .orderBy("c_mktsegment")
  }

  /** Hive-style partitioned write + partition-pruned read (S5 at lake
    * scale): orders written out partitioned by priority, re-read with a
    * partition predicate. On a 100 TB lake this is the difference
    * between scanning one directory and scanning them all — the spec
    * side (`PlanShapeSpec`) asserts the pruning actually reaches the
    * scan node, this key asserts the values survive the layout. */
  private val partitionedPrune = Q(
    "sink_partitioned_prune",
    s"""SELECT o_orderpriority, count(*) AS n, ${Det.osum("o_totalprice")} AS tot
       |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val ord = Tables.orders(s, d)
    val dir = tmp(s"part_${d.replaceAll("[^0-9.]", "")}")
    ord.write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    s.read.parquet(dir)
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("tot"))
      .orderBy("o_orderpriority")
  }

  /** Plain-text source (S1's line-oriented face): document bodies
    * written as raw lines (`spark.write.text`), re-read with
    * `spark.read.text`, re-keyed by the embedded id token, and
    * checksummed. The fixture's `text` is newline-free (verified), so
    * the line roundtrip is lossless; the oracle recomputes the same
    * checksum from parquet directly. */
  private val textRoundtrip = Q(
    "source_text_roundtrip",
    s"""SELECT count(*) AS n,
       |  CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars,
       |  CAST(sum(${graft.functions.Hashes.oPolyHash("text")} % 1000003) AS BIGINT) AS checksum
       |FROM documents""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val dir = tmp(s"text_${d.replaceAll("[^0-9.]", "")}")
    docs.select(col("text")).write.mode("overwrite").text(dir)
    s.read.text(dir)
      .agg(count(lit(1)).as("n"),
        sum(length(col("value")).cast("long")).as("total_chars"),
        sum(pmod(graft.functions.Hashes.polyHash(col("value")), lit(1000003L)))
          .as("checksum"))
  }

  /** Z-order clustered rewrite + 2-D box read
    * ([[graft.operators.LayoutOps.zOrderBy]]): lineitem rewritten on
    * the Morton key of (partkey, suppkey), then a box predicate on both
    * dimensions — after the rewrite each row group spans a small z
    * range, so BOTH box bounds prune via parquet min/max stats (a
    * single-column sort prunes only its lead column). Values are
    * layout-invariant, so the oracle is the plain box aggregate over
    * the original table. */
  private val zorderBox = Q(
    "sink_zorder_box",
    s"""SELECT count(*) AS n, ${Det.osum("l_extendedprice")} AS rev
       |FROM lineitem
       |WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 40""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val dir = tmp(s"zorder_${d.replaceAll("[^0-9.]", "")}")
    graft.operators.LayoutOps.zOrderBy(li, "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .where(col("l_partkey").between(100, 300) &&
        col("l_suppkey").between(10, 40))
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("rev"))
  }

  /** Hilbert clustered rewrite + 2-D box read
    * ([[graft.operators.LayoutOps.hilbertBy]]): [[zorderBox]]'s twin on
    * the Hilbert curve — stronger locality (consecutive curve positions
    * are always grid-adjacent, so row groups cover tighter boxes), same
    * layout-invariance contract, same plain box-aggregate oracle. A
    * different box than the z-order key so the two prune independently. */
  private val hilbertBox = Q(
    "sink_hilbert_box",
    s"""SELECT count(*) AS n, ${Det.osum("l_extendedprice")} AS rev
       |FROM lineitem
       |WHERE l_partkey BETWEEN 500 AND 800 AND l_suppkey BETWEEN 50 AND 90""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val dir = tmp(s"hilbert_${d.replaceAll("[^0-9.]", "")}")
    graft.operators.LayoutOps.hilbertBy(li, "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .where(col("l_partkey").between(500, 800) &&
        col("l_suppkey").between(50, 90))
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("rev"))
  }

  /** Small-files compaction ([[graft.operators.LayoutOps.compact]]):
    * orders deliberately shattered into 64 tiny files, compacted back by
    * byte-sized bin-packing, then aggregated from the compacted copy.
    * The oracle aggregates the original table — any row lost or
    * duplicated by the rewrite breaks the hash; the file-count bound is
    * spec-side (`LayoutSpec`). */
  private val layoutCompact = Q(
    "layout_compact",
    s"""SELECT o_orderstatus, count(*) AS n, ${Det.osum("o_totalprice")} AS tot
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val ord = Tables.orders(s, d)
    val shattered = tmp(s"shatter_${d.replaceAll("[^0-9.]", "")}")
    val compacted = tmp(s"compact_${d.replaceAll("[^0-9.]", "")}")
    ord.repartition(64).write.mode("overwrite").parquet(shattered)
    graft.operators.LayoutOps
      .compact(s, shattered, compacted, targetFileBytes = 4L * 1024 * 1024)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("tot"))
      .orderBy("o_orderstatus")
  }

  /** Schema evolution under `mergeSchema` (S5's other operational
    * face): an early batch written with a narrow schema, a later batch
    * with an added column, one merged read — old rows surface the new
    * column as NULL. The oracle reproduces the per-batch membership
    * with the same key-parity split, so both the merge AND the null
    * semantics are hash-pinned.
    *
    * @note scale: mergeSchema reconciles footers at planning time
    *   (driver-side, O(files) — on a real lake pin the merged schema in
    *   a catalog instead of re-deriving it per query); the scan itself
    *   stays columnar with constant-NULL fill for absent chunks. */
  private val schemaEvolution = Q(
    "source_schema_evolution",
    s"""SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'NONE' ELSE o_orderpriority END AS pri,
       |  count(*) AS n, ${Det.osum("o_totalprice")} AS tot
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val ord = Tables.orders(s, d)
    val dir = tmp(s"evo_${d.replaceAll("[^0-9.]", "")}")
    ord.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/batch1")
    ord.filter(col("o_orderkey") % 2 =!= 0)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/batch2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$dir/batch1", s"$dir/batch2")
      .select(coalesce(col("o_orderpriority"), lit("NONE")).as("pri"),
        col("o_totalprice"))
      .groupBy("pri")
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("tot"))
      .orderBy("pri")
  }

  /** Bucketed co-located join ([[graft.operators.LayoutOps.bucketize]]):
    * orders and customer rewritten as bucketed tables on their join
    * keys (8 buckets each), then joined and aggregated — the join runs
    * with NO shuffle exchange under either side (plan-gated in
    * `BucketedJoinSpec`); at 100 TB that is the fact table's shuffle
    * paid once at ingest instead of per query. Values are
    * layout-invariant, so the oracle is the plain join aggregate. */
  private val bucketedJoin = Q(
    "sink_bucketed_join",
    s"""SELECT c_mktsegment, count(*) AS n, ${Det.osum("o_totalprice")} AS rev
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val sfx = d.replaceAll("[^0-9.]", "").replace(".", "_")
    val ob = graft.operators.LayoutOps.bucketize(Tables.orders(s, d),
      s"orders_bkt_$sfx", tmp(s"bkt_orders_$sfx"), "o_custkey")
    val cb = graft.operators.LayoutOps.bucketize(Tables.customer(s, d),
      s"customer_bkt_$sfx", tmp(s"bkt_customer_$sfx"), "c_custkey")
    ob.join(cb, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("rev"))
      .orderBy("c_mktsegment")
  }

  val all: Seq[Q] = Seq(csvRoundtrip, jsonRoundtrip, orcRoundtrip,
    partitionedPrune, textRoundtrip, zorderBox, hilbertBox, layoutCompact,
    schemaEvolution, bucketedJoin)
}
