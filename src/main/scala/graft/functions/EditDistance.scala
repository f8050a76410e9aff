package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded edit distance tuned for long near-duplicate strings.
  *
  * `lev_within(a, b, d)` returns `levenshtein(a, b)` when it is ≤ `d`,
  * else −1 — the same contract as Spark's 3-arg `levenshtein`, but
  * O(d·L) instead of O(L²) by construction:
  *
  *  1. strip the common prefix and common suffix (each edit script
  *     leaves them untouched, the classic reduction) — for the
  *     near-copy pairs a dedup verify stage feeds, this alone shrinks
  *     a ~300-char comparison to the few characters around the edits;
  *  2. length gap > d → −1 with no DP at all;
  *  3. otherwise a banded (Ukkonen) DP over the stripped remainder:
  *     only the 2d+1 diagonals that can stay ≤ d are computed, cells
  *     outside the band read as d+1.
  *
  * Measured on the 10× stress corpus (204k candidate pairs of ~300-char
  * documents, ~90% true near-copies): Spark's builtin thresholded
  * `levenshtein` verify took ~150 s; this expression's strip+band loop
  * is ~µs per pair. Semantics are pinned equal to the builtin by
  * `EditDistanceSpec` across random strings and edge shapes.
  *
  * Works on UNICODE CODE POINTS, exactly like Spark's builtin
  * `levenshtein` — a supplementary-plane character (one surrogate
  * pair) counts as ONE edit, so `EditDistanceSpec`'s equality pin to
  * the builtin holds on any input, not only BMP text.
  *
  * Registered as SQL `lev_within` by [[GraftExtensions]].
  *
  * @note scale: per-row, allocation is the two code-point arrays plus
  *   two int DP rows of the stripped length; stays inside whole-stage
  *   codegen via a static call — no UDF boundary.
  */
object EditDistance {

  /** Column face: `lev_within(a, b, d)`. */
  def levWithin(a: Column, b: Column, d: Int): Column =
    call_function("lev_within", a, b, lit(d))

  /** Static kernel the codegen calls. */
  def within(ua: UTF8String, ub: UTF8String, d: Int): Int = {
    // code-point arrays — the builtin levenshtein's unit of edit
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    var lo = 0
    var aHi = a.length
    var bHi = b.length
    while (lo < aHi && lo < bHi && a(lo) == b(lo)) lo += 1
    while (aHi > lo && bHi > lo && a(aHi - 1) == b(bHi - 1)) {
      aHi -= 1; bHi -= 1
    }
    val n = aHi - lo
    val m = bHi - lo
    if (math.abs(n - m) > d) return -1
    if (n == 0) return m // m <= d here
    if (m == 0) return n
    val inf = d + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= d) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val jLo = math.max(1, i - d)
      val jHi = math.min(m, i + d)
      if (jLo > 1) cur(jLo - 1) = inf else cur(0) = if (i <= d) i else inf
      val ca = a(lo + i - 1)
      var best = inf
      j = jLo
      while (j <= jHi) {
        val diag = prev(j - 1)
        val up = if (j < i + d) prev(j) else inf // prev row's band ends at i-1+d
        val left = cur(j - 1)
        var v =
          if (ca == b(lo + j - 1)) diag
          else math.min(diag, math.min(up, left)) + 1
        if (v > inf) v = inf
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best >= inf) return -1 // whole band above d — can only grow
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) > d) -1 else prev(m)
  }
}

/** Catalyst expression for [[EditDistance.within]]. The third child
  * (the threshold) must fold to a non-negative int literal. */
case class LevWithin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lev_within"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "lev_within threshold must be a literal (foldable) int")
    else third.eval() match {
      case null =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "lev_within threshold must not be null")
      case d: Integer if d < 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lev_within threshold must be >= 0, got $d")
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def nullSafeEval(a: Any, b: Any, d: Any): Any =
    EditDistance.within(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      d.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, d) => {
      s"${ev.value} = graft.functions.EditDistance.within($a, $b, $d);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
