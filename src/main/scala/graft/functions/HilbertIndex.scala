package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Hilbert-curve index of a point on a
  * 2^order × 2^order grid (the classic iterative xy→d walk with
  * quadrant rotation — see Hamilton, "Compact Hilbert Indices", and the
  * reference formulation popularized by Warren's Hacker's Delight /
  * Wikipedia "Hilbert curve").
  *
  * Why next to [[graft.operators.LayoutOps.zValue]]: both linearize 2-D
  * locality for clustered table layout, but the Hilbert walk never
  * makes the long diagonal jumps Morton interleaving does, so
  * consecutive indices are ALWAYS grid-adjacent (Manhattan distance 1 —
  * spec-pinned). Sorted row groups therefore cover tighter boxes and
  * box predicates prune slightly better, at the cost of an iterative
  * per-row loop instead of Morton's static shift/mask tree. The loop is
  * `order` iterations of integer ops inside whole-stage codegen — no
  * allocation, no UDF boundary.
  *
  * Negative inputs or inputs ≥ 2^order are clamped into the grid (the
  * layout stays valid — clamped rows cluster at the curve's ends —
  * and values are untouched since the index is only a sort key).
  *
  * @note scale: like z-order this is a WRITE-side investment; pick
  *   `order` so the grid resolves your key cardinality (order 16 = 64k
  *   cells per side). For k > 2 dims, compose two indices
  *   (hilbert(hilbert(x,y), z)) or fall back to Morton interleave —
  *   the curve's advantage shrinks as dimensions grow.
  */
case class HilbertIndex(left: Expression, right: Expression, order: Int = 16)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(order >= 1 && order <= 31, s"order must be in [1,31], got $order")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], order)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, py) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val side = 1L << order
      s"""
         |long $x = $px < 0L ? 0L : ($px >= ${side}L ? ${side - 1}L : $px);
         |long $y = $py < 0L ? 0L : ($py >= ${side}L ? ${side - 1}L : $py);
         |long $d = 0L;
         |for (long $s = ${side >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = ($x & $s) > 0L ? 1L : 0L;
         |  long $ry = ($y & $s) > 0L ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Interpreted reference (used by nullSafeEval and the parity spec). */
  def xy2d(px: Long, py: Long, order: Int): Long = {
    val side = 1L << order
    var x = if (px < 0L) 0L else if (px >= side) side - 1 else px
    var y = if (py < 0L) 0L else if (py >= side) side - 1 else py
    var d = 0L
    var s = side >> 1
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
