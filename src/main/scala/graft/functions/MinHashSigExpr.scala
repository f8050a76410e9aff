package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 64-permutation MinHash signature over a hashed shingle set —
  * `minhash_sig64(array<long>) -> array<long>(64)`, arithmetic
  * BIT-IDENTICAL to [[SketchAggregators.MinHashSig]] (`x = h mod M`,
  * `(2i+1)·x + (1000003·i + 12345) mod M`, min per permutation;
  * parity spec-pinned by `DedupIndexSpec`).
  *
  * Exists because the row-local serve kernel of the cross-epoch dedup
  * index ([[graft.operators.DedupOps.rowBands]]) first computed this
  * with nested higher-order `transform`s — 64·|xs| INTERPRETED lambda
  * invocations per document — measured at 15–23 s per cross-epoch
  * bench key at sf0.1; this tight two-loop JVM kernel is the
  * "native expression beats HOF lambda" rule applied to the hot path.
  * (CodegenFallback: the expression itself is not whole-stage-fused,
  * but it runs once per document row and its interior is compiled —
  * the fusion loss is noise next to the lambda overhead it removes.)
  */
case class MinHashSig64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig64"

  private val M = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val sig = Array.fill(64)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = xs.getLong(j) % M
      var i = 0
      while (i < 64) {
        val h = ((2L * i + 1L) * x + (1000003L * i + 12345L)) % M
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    ArrayData.toArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
