package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic string hashing (SURVEY.md §2.10).
  *
  * Engine-native hashes differ (Spark xxhash64/murmur3 vs DuckDB's
  * internal hash), so every hash that must be oracle-checked is a
  * polynomial rolling hash both engines can evaluate exactly with
  * 64-bit integer arithmetic:
  *
  *   h_0 = 0;  h_{i+1} = (31 * h_i + ascii(c_i)) mod P,  P < 2^57
  *
  * P below 2^57 keeps 31*h + c < 2^62, safely inside BIGINT on both
  * engines (DuckDB errors on int64 overflow rather than wrapping).
  * Spark evaluates it as a codegen'd higher-order `aggregate` fold;
  * DuckDB as `list_reduce` over the same char sequence.
  *
  * @note scale: the fold is per-row, embarrassingly parallel, and stays
  *   inside whole-stage codegen — no shuffle, no UDF deserialization.
  *
  * Domain bound: parity holds for BMP text (and byte-for-codepoint for
  * ASCII). Spark's `split(s, "")` yields UTF-16 code units while
  * DuckDB's `string_split(s, '')` yields codepoints, so surrogate-pair
  * characters (emoji etc.) fold differently. A corpus beyond the BMP
  * needs a byte-domain hash on both engines (DuckDB 1.0 lacks blob
  * iteration, so that day the oracle moves to a precomputed column).
  */
object Hashes {

  /** Modulus: largest prime-ish constant < 2^57 we fold under. */
  val P = 144115188075855859L

  /** Spark column: rolling hash of every character of `c` (spaces
    * included). `split(s, "")` appends a trailing "" in Spark (Java
    * regex semantics) which DuckDB's `string_split(s,'')` does not
    * produce — filtered out so both engines fold the same sequence. */
  def polyHash(c: Column): Column =
    aggregate(
      filter(split(c, ""), ch => ch =!= ""),
      lit(0L),
      (h, ch) => pmod(h * lit(31L) + ascii(ch).cast("long"), lit(P)))

  /** DuckDB fragment computing the identical fold over `x`. */
  def oPolyHash(x: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($x, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % $P)"
}
