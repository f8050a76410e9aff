package graft.queries

import graft.{Q, Tables}
import graft.functions.WeightedAvg
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.8) plus the UDF/UDAF surface
  * (§2.11). One key per family; each is a single projection computing
  * many functions so one oracle checks the whole family. All functions
  * used here are codegen'd builtins except `udf_scalar`, which
  * deliberately exercises the (non-codegen) Scala UDF path.
  */
object ScalarQueries {

  // ---------------------------------------------------------------- F1 string

  private val scalarString = Q(
    "scalar_string",
    """SELECT p_partkey,
      |  lower(p_name) AS lo, upper(p_brand) AS up,
      |  substring(p_name, 1, 5) AS sub5,
      |  CAST(length(p_name) AS INT) AS len,
      |  replace(p_name, ' ', '_') AS repl,
      |  concat_ws('|', p_brand, p_type) AS cw,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
      |  string_split(p_name, ' ')[1] AS first_tok,
      |  regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_no,
      |  p_type LIKE '%ECO%' AS is_eco,
      |  trim('  ' || p_brand || ' ') AS trimmed
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      lower(col("p_name")).as("lo"), upper(col("p_brand")).as("up"),
      substring(col("p_name"), 1, 5).as("sub5"),
      length(col("p_name")).as("len"),
      expr("replace(p_name, ' ', '_')").as("repl"),
      concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
      lpad(col("p_size").cast("string"), 4, "0").as("padded"),
      element_at(split(col("p_name"), " "), 1).as("first_tok"),
      regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_no"),
      col("p_type").like("%ECO%").as("is_eco"),
      trim(concat(lit("  "), col("p_brand"), lit(" "))).as("trimmed"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- F2 date/time

  private val scalarDatetime = Q(
    "scalar_datetime",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS dd,
      |  CAST(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS mon_start,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
      |  CAST(o_orderdate + INTERVAL 30 DAY AS VARCHAR) AS plus30,
      |  CAST(o_orderdate - INTERVAL 1 HOUR AS VARCHAR) AS minus1h
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dd"),
      date_trunc("month", col("o_orderdate")).cast("string").as("mon_start"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
      (col("o_orderdate") + expr("INTERVAL 30 DAY")).cast("string").as("plus30"),
      (col("o_orderdate") - expr("INTERVAL 1 HOUR")).cast("string").as("minus1h"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- F3 math

  /** Transcendentals are rounded to 6: Java StrictMath-lineage libm vs
    * DuckDB's C libm may differ in the last ulp; pure-arithmetic outputs
    * (floor/ceil/abs/pmod on identical doubles) are emitted raw. */
  private val scalarMath = Q(
    "scalar_math",
    """SELECT l_orderkey, l_linenumber,
      |  round(sqrt(l_extendedprice), 6) AS sq,
      |  round(ln(l_extendedprice), 6) AS lg,
      |  round(log10(l_extendedprice), 6) AS l10,
      |  round(exp(l_discount), 6) AS ex,
      |  round(pow(l_quantity, 2), 4) AS pw,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
      |  abs(l_discount - 0.05) AS ab,
      |  greatest(l_quantity, l_discount * 100.0) AS gr,
      |  least(l_quantity, l_tax * 100.0) AS le,
      |  CAST(sign(l_discount - 0.05) AS INT) AS sg,
      |  l_orderkey % 7 AS pm
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      round(sqrt(col("l_extendedprice")), 6).as("sq"),
      round(log(col("l_extendedprice")), 6).as("lg"),
      round(log10(col("l_extendedprice")), 6).as("l10"),
      round(exp(col("l_discount")), 6).as("ex"),
      round(pow(col("l_quantity"), 2), 4).as("pw"),
      floor(col("l_extendedprice")).as("fl"),
      ceil(col("l_extendedprice")).as("ce"),
      abs(col("l_discount") - lit(0.05)).as("ab"),
      greatest(col("l_quantity"), col("l_discount") * 100.0).as("gr"),
      least(col("l_quantity"), col("l_tax") * 100.0).as("le"),
      signum(col("l_discount") - lit(0.05)).cast("int").as("sg"),
      pmod(col("l_orderkey"), lit(7L)).as("pm"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---------------------------------------------------------------- F4 conditional

  private val scalarConditional = Q(
    "scalar_conditional",
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice < 50000 THEN 'low'
      |       WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS bucket,
      |  nullif(o_orderstatus, 'P') AS not_pending,
      |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
      |  CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 ELSE 0 END AS status_code
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_totalprice") < 50000, "low")
        .when(col("o_totalprice") < 150000, "mid")
        .otherwise("high").as("bucket"),
      nullif(col("o_orderstatus"), lit("P")).as("not_pending"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
      when(col("o_orderstatus") === "F", 1)
        .when(col("o_orderstatus") === "O", 2)
        .otherwise(0).as("status_code"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- F5 array / higher-order fns

  /** Higher-order array functions over the embedding column — the same
    * primitives the kNN operator (L3) rides, kept codegen-friendly.
    * Float elements are cast to double INSIDE the lambda so both engines
    * do double arithmetic in the same left-to-right fold order. */
  private val scalarArray = Q(
    "scalar_array",
    """SELECT vec_id,
      |  CAST(len(embedding) AS INT) AS dim,
      |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS ssum,
      |  round(sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
      |  CAST(list_max(embedding) AS DOUBLE) AS mx
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      round(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double")), 6).as("ssum"),
      round(sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))), 6).as("l2"),
      size(filter(col("embedding"), x => x > 0)).as("n_pos"),
      array_max(col("embedding")).cast("double").as("mx"))
      .orderBy("vec_id")
  }

  // ---------------------------------------------------------------- F6+F7 JSON / map

  private val scalarJson = Q(
    "scalar_json",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_parsed,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_map
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    val kv = get_json_object(col("props"), "$.k")
    Tables.events(s, d).select(
      col("event_id"),
      kv.cast("int").as("k_int"),
      kv.as("k_str"),
      // from_json path: parse with an explicit schema, extract the field
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_parsed"),
      // map path: build a map from the parsed value, read it back
      element_at(map(lit("k"), kv.cast("int")), "k").as("k_map"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- X1 scalar UDF + X2 UDAF

  /** Haversine-style great-circle distance as a Scala UDF (the velocity
    * surface; a hot-path version would be a codegen Expression).
    * Pseudo-coords are derived from stored columns so the oracle can
    * recompute the identical closed form. */
  private val udfScalar = Q(
    "udf_scalar",
    """SELECT c_custkey,
      |  round(2 * 6371.0 * asin(sqrt(
      |    pow(sin(radians(fmod(abs(c_acctbal), 80.0) - 10.0) / 2), 2)
      |    + cos(radians(fmod(abs(c_acctbal), 80.0))) * cos(radians(10.0))
      |      * pow(sin(radians(fmod(CAST(c_custkey AS DOUBLE), 160.0) - 20.0) / 2), 2)
      |  )), 4) AS dist_km
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val hav = udf { (acctbal: Double, custkey: Long) =>
      val lat1 = math.abs(acctbal) % 80.0
      val lon1 = custkey.toDouble % 160.0
      val (lat2, lon2) = (10.0, 20.0)
      val dLat = math.toRadians(lat1 - lat2)
      val dLon = math.toRadians(lon1 - lon2)
      val a = math.pow(math.sin(dLat / 2), 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.pow(math.sin(dLon / 2), 2)
      BigDecimal(2 * 6371.0 * math.asin(math.sqrt(a)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Tables.customer(s, d)
      .select(col("c_custkey"), hav(col("c_acctbal"), col("c_custkey")).as("dist_km"))
      .orderBy("c_custkey")
  }

  private val aggWeightedAvg = Q(
    "agg_weighted_avg",
    """SELECT l_returnflag,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)) * CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
      |        / CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS wavg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val wavg = udaf(WeightedAvg)
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------- F3b bitwise
  private val scalarBitwise = Q(
    "scalar_bitwise",
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS b_and, o_orderkey | 16 AS b_or,
      |  xor(o_orderkey, 85) AS b_xor,
      |  o_orderkey << 2 AS b_shl, o_orderkey >> 3 AS b_shr,
      |  CAST(bit_count(o_orderkey) AS INT) AS b_cnt
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_orderkey").bitwiseAND(lit(255L)).as("b_and"),
      col("o_orderkey").bitwiseOR(lit(16L)).as("b_or"),
      col("o_orderkey").bitwiseXOR(lit(85L)).as("b_xor"),
      expr("shiftleft(o_orderkey, 2)").as("b_shl"),
      expr("shiftright(o_orderkey, 3)").as("b_shr"),
      bit_count(col("o_orderkey")).as("b_cnt"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- F3c trig
  /** Trigonometry family — rounded to 6 like the other transcendentals
    * (Java vs C libm last-ulp divergence). */
  private val scalarTrig = Q(
    "scalar_trig",
    """SELECT o_orderkey,
      |  round(sin(o_totalprice / 100000.0), 6) AS sn,
      |  round(cos(o_totalprice / 100000.0), 6) AS cs,
      |  round(atan(o_totalprice / 100000.0), 6) AS at,
      |  round(atan2(CAST(o_orderkey % 7 AS DOUBLE), 3.0), 6) AS at2,
      |  round(degrees(o_totalprice / 100000.0), 6) AS dg,
      |  round(radians(CAST(o_orderkey % 360 AS DOUBLE)), 6) AS rd
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val x = col("o_totalprice") / 100000.0
    Tables.orders(s, d).select(
      col("o_orderkey"),
      round(sin(x), 6).as("sn"),
      round(cos(x), 6).as("cs"),
      round(atan(x), 6).as("at"),
      round(atan2(pmod(col("o_orderkey"), lit(7L)).cast("double"), lit(3.0)), 6).as("at2"),
      round(degrees(x), 6).as("dg"),
      round(radians(pmod(col("o_orderkey"), lit(360L)).cast("double")), 6).as("rd"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- F8 cast matrix
  private val scalarCast = Q(
    "scalar_cast",
    """SELECT o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
      |  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
      |  CAST(o_orderdate AS DATE) AS od_date,
      |  CAST(o_orderkey AS DOUBLE) AS key_dbl,
      |  CAST('42' AS INT) AS s2i,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_str"),
      col("o_orderkey").cast("string").cast("long").as("key_roundtrip"),
      col("o_orderdate").cast("date").as("od_date"),
      col("o_orderkey").cast("double").as("key_dbl"),
      lit("42").cast("int").as("s2i"),
      col("o_orderdate").cast("date").cast("string").as("date_str"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- F6 map
  /** Map construction + access functions (SURVEY.md §2.8 F6, previously
    * folded into scalar_json): `map`, `map_from_arrays`, `element_at`,
    * `map_keys`/`map_values` (insertion-ordered in Spark, so the joined
    * key string and the fold order are deterministic), `map_filter`, and
    * a `aggregate` fold over `map_values`. DuckDB has no ordered-map
    * functions, so the oracle states each extracted scalar directly —
    * the key verifies the map surface produces the right VALUES, not
    * DuckDB's map layout. */
  private val scalarMap = Q(
    "scalar_map",
    """SELECT l_orderkey, l_linenumber,
      |  l_quantity AS qty, l_discount AS disc,
      |  CAST(2 AS INT) AS nkeys, 'qty,disc' AS ks,
      |  l_returnflag AS rf,
      |  CAST(CASE WHEN l_quantity > 1 THEN 1 ELSE 0 END AS INT) AS nbig,
      |  l_quantity + l_discount AS vsum
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        map(lit("qty"), col("l_quantity"), lit("disc"), col("l_discount")).as("m"),
        map_from_arrays(array(lit("rf"), lit("ls")),
          array(col("l_returnflag"), col("l_linestatus"))).as("sm"))
      .select(col("l_orderkey"), col("l_linenumber"),
        element_at(col("m"), "qty").as("qty"),
        element_at(col("m"), "disc").as("disc"),
        size(col("m")).cast("int").as("nkeys"),
        array_join(map_keys(col("m")), ",").as("ks"),
        element_at(col("sm"), "rf").as("rf"),
        size(map_filter(col("m"), (_, v) => v > 1)).cast("int").as("nbig"),
        aggregate(map_values(col("m")), lit(0.0), (a, x) => a + x).as("vsum"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Edit-distance similarity: levenshtein between each doc's 40-char
    * prefix and its successor doc's — the string-metric primitive under
    * fuzzy matching / near-dup triage. Integer output, so the hash
    * oracle is exact; the self-join on `doc_id + 1` keeps the pairing
    * deterministic without a window.
    *
    * @note scale: levenshtein is O(len²) per pair — bound the compared
    *   prefix (as here) or pre-block pairs (LSH/simhash) before running
    *   it corpus-wide; never as a theta-join predicate. */
  private val scalarStrsim = Q(
    "scalar_strsim",
    """SELECT a.doc_id,
      |  CAST(levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) AS INT) AS lev,
      |  CAST(levenshtein(a.source, b.source) AS INT) AS lev_src
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val a = docs.select(col("doc_id"), col("text"), col("source"))
    val b = docs.select(col("doc_id").as("b_id"), col("text").as("b_text"),
      col("source").as("b_source"))
    a.join(b, col("b_id") === col("doc_id") + 1)
      .select(col("doc_id"),
        levenshtein(substring(col("text"), 1, 40),
          substring(col("b_text"), 1, 40)).as("lev"),
        levenshtein(col("source"), col("b_source")).as("lev_src"))
      .orderBy("doc_id")
  }

  /** URL parsing: Spark's native `parse_url` against a regex oracle
    * (DuckDB has no URL parser) — every constructed URL carries a query
    * string, so parse_url's NULL-on-absent and regexp_extract's
    * ''-on-absent never diverge. */
  private val scalarUrl = Q(
    "scalar_url",
    """WITH u AS (SELECT doc_id,
      |    'https://' || source || '.example.com/docs/' || doc_id
      |      || '?lang=' || lang || '&v=2' AS url
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_extract(url, '://([^/]+)', 1) AS host,
      |  regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
      |  regexp_extract(url, '[?&]lang=([^&]+)', 1) AS lang_param
      |FROM u ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id"), lit("?lang="), col("lang"), lit("&v=2")).as("url"))
      .select(col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(scalarString, scalarDatetime, scalarMath,
    scalarConditional, scalarArray, scalarJson, udfScalar, aggWeightedAvg,
    scalarBitwise, scalarTrig, scalarCast, scalarMap, scalarStrsim,
    scalarUrl)
}
