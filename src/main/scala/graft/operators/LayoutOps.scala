package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — how a 100 TB table is ARRANGED on disk so
  * queries read less of it. Values are untouched; only file order and
  * boundaries change, which is why these ops oracle-check as plain
  * filters over the unarranged data.
  */
object LayoutOps {

  /** Morton (z-order) key: interleave the low `bits` bits of two
    * non-negative integer columns — a space-filling curve linearizing
    * 2-D locality. Sorting by it clusters rows close in BOTH dimensions
    * into the same parquet row groups, so min/max stats prune 2-D box
    * predicates that a single-column sort can only prune on its lead
    * column. Static expression tree (2·bits shift-mask terms), fully
    * codegen'd; no HOF, no UDF.
    *
    * @note scale: z-ordering is a WRITE-side investment — one
    *   repartitionByRange+sort at ingest buys every subsequent box
    *   query its row-group skipping. Extend to k dims by interleaving
    *   k streams; beyond ~3 dims or very skewed dims, a Hilbert curve
    *   or size-bounded clustering does better (documented trade). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)): Column
    }.reduce(_ + _)

  /** Rewrite `df` clustered on the z-order of (`xCol`, `yCol`):
    * range-partition by z (balanced output files), sort within
    * partitions by z (tight row-group stats on both dimensions). */
  def zOrderBy(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int = 8, bits: Int = 16): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
