package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
    * included), via the native codegen expression [[PolyHash]]
    * (registered as SQL `poly_hash` by [[GraftExtensions]]). The
    * higher-order-function fold it replaces ([[polyHashRef]]) is not
    * whole-stage-codegen'd (HOF lambdas are interpreted per element and
    * the `split` materializes a per-character array); the native loop
    * hashes the string in place. `HashesParitySpec` pins native == HOF. */
  def polyHash(c: Column): Column = call_function("poly_hash", c)

  /** The original higher-order `aggregate` fold — kept as the
    * executable cross-engine REFERENCE for the native expression.
    * `split(s, "")` appends a trailing "" in Spark (Java regex
    * semantics) which DuckDB's `string_split(s,'')` does not produce —
    * filtered out so both engines fold the same sequence. */
  def polyHashRef(c: Column): Column =
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

/** Native Catalyst expression for [[Hashes.polyHash]]: one tight loop
  * over the string's UTF-16 code units inside whole-stage codegen —
  * no per-character array, no interpreted lambda. Semantics are
  * EXACTLY the HOF fold's (same code-unit domain, same BMP bound as
  * documented on [[Hashes]]); parity is spec-pinned, and the DuckDB
  * oracle fragment is unchanged.
  *
  * @note scale: shingle/fingerprint hashing sits under every dedup and
  *   decontamination key — this keeps that entire family codegen-fused
  *   with its tokenization instead of breaking the stage at each hash. */
case class PolyHash(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (31L * h + s.charAt(i)) % Hashes.P
      i += 1
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $x.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = (31L * $h + $s.charAt($i)) % ${Hashes.P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
