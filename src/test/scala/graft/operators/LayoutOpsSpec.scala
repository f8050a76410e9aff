package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Morton-key bit interleaving pinned against hand-computed values,
  * plus the locality property that justifies the layout. */
class LayoutOpsSpec extends SparkSpec {

  test("zValue interleaves bits: x even lanes, y odd lanes") {
    import spark.implicits._
    val cases = Seq(
      (0L, 0L, 0L),
      (1L, 0L, 1L),          // x bit 0 → z bit 0
      (0L, 1L, 2L),          // y bit 0 → z bit 1
      (3L, 0L, 5L),          // x=11₂ → z=0101₂
      (0L, 3L, 10L),         // y=11₂ → z=1010₂
      (3L, 3L, 15L),         // both → 1111₂
      (5L, 6L, 0x39L))       // x=101,y=110 → z=111001₂
    val got = cases.map(_._1).zip(cases.map(_._2)).toDF("x", "y")
      .select(LayoutOps.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map(_._3))
  }

  test("z-sort clusters a 2-D box into a contiguous-ish id range") {
    import spark.implicits._
    // all points of an 16x16 grid, z-sorted; the 4x4 box [4,7]x[4,7] is
    // a single aligned z-quadrant → exactly contiguous in z order
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val sorted = pts.toDF("x", "y")
      .withColumn("z", LayoutOps.zValue(col("x"), col("y")))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1)))
    val idx = sorted.zipWithIndex.collect {
      case ((x, y), i) if x >= 4 && x <= 7 && y >= 4 && y <= 7 => i
    }
    assert(idx.length == 16)
    assert(idx.max - idx.min == 15, "aligned z-quadrant must be contiguous")
  }
}
