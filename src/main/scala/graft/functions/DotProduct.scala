package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: dot product of two double arrays.
  *
  * The similarity operators' hot path (SURVEY.md §2.10 L3, §4 "custom
  * maybe") — the higher-order `aggregate(zip_with(a,b,*),0,+)` form
  * allocates an intermediate array and evaluates two lambdas per pair;
  * measured 24.9 s on the sf0.1 all-pairs cosine. This expression
  * whole-stage-codegens to a tight fused multiply-add loop with zero
  * allocation, summing left-to-right exactly like the HOF fold (and
  * DuckDB's `list_sum`), so oracle parity is unchanged.
  *
  * Registered as SQL function `vec_dot` via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  *
  * @note scale: keeps the pair loop inside WholeStageCodegen — no UDF
  *   serialization boundary, no per-pair garbage; the dominant cost
  *   becomes the memory-bandwidth-bound multiply-add itself.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql] in Spark 4; Seq is covariant so the
  // narrower DataType element type still satisfies the override.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension injecting graft's native SQL functions. Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * ([[graft.Verify]], [[graft.Bench]] and the test harness all do). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig64"),
      new ExpressionInfo(classOf[MinHashSig64].getName, "minhash_sig64"),
      (children: Seq[Expression]) => MinHashSig64(children.head)))
    // hilbert_index(x, y[, order]) — order must be a foldable int literal
    ext.injectFunction((
      FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (children: Seq[Expression]) => {
        def bad(msg: String) = new org.apache.spark.sql.AnalysisException(
          "_LEGACY_ERROR_TEMP_1332", Map("errorMessage" -> msg), None)
        if (children.size < 2 || children.size > 3)
          throw bad(s"hilbert_index(x, y[, order]) takes 2 or 3 arguments, " +
            s"got ${children.size}")
        val order = children.lift(2).map {
          case lit if lit.foldable => lit.eval(null) match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw bad(
              s"hilbert_index order must be an integer literal, got $other")
          }
          case nonLit => throw bad(
            s"hilbert_index order must be a foldable integer literal, " +
              s"got ${nonLit.sql}")
        }.getOrElse(16)
        HilbertIndex(children.head, children(1), order)
      }))
    ext.injectFunction((
      FunctionIdentifier("lev_within"),
      new ExpressionInfo(classOf[LevWithin].getName, "lev_within"),
      (children: Seq[Expression]) =>
        LevWithin(children.head, children(1), children(2))))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
