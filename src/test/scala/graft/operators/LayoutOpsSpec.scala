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

  test("hilbertValue is a bijection onto 0..4^order-1 and codegen matches " +
      "the interpreted reference") {
    import spark.implicits._
    val order = 3 // 8x8 grid
    val pts = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        LayoutOps.hilbertValue(col("x"), col("y"), order).as("h"))
      .as[(Long, Long, Long)].collect()
    // bijection: 64 distinct values covering exactly 0..63
    assert(got.map(_._3).sorted.toSeq == (0L until 64L))
    // codegen path == interpreted reference implementation
    got.foreach { case (x, y, h) =>
      assert(h == graft.functions.HilbertIndex.xy2d(x, y, order),
        s"codegen/interpreted divergence at ($x,$y)")
    }
  }

  test("consecutive Hilbert indices are always grid-adjacent (the locality " +
      "property Morton lacks)") {
    val order = 4 // 16x16
    val byH = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
      .map { case (x, y) => (graft.functions.HilbertIndex.xy2d(x, y, order), x, y) }
      .sortBy(_._1)
    byH.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"($x1,$y1)->($x2,$y2) not adjacent")
    }
    // Morton violates this (e.g. z=1 (1,0) -> z=2 (0,1) jumps diagonally),
    // which is exactly why hilbertBy exists next to zOrderBy.
  }

  test("out-of-grid inputs clamp instead of corrupting the sort key") {
    import spark.implicits._
    val order = 3
    val got = Seq((-5L, 2L), (100L, 2L), (7L, 2L), (0L, 2L))
      .toDF("x", "y")
      .select(LayoutOps.hilbertValue(col("x"), col("y"), order).as("h"))
      .as[Long].collect()
    assert(got(0) == graft.functions.HilbertIndex.xy2d(0, 2, order))
    assert(got(1) == graft.functions.HilbertIndex.xy2d(7, 2, order))
    assert(got(2) == got(1))
    assert(got(3) == got(0))
  }

  test("compact bin-packs a shattered table to the expected file count " +
      "and preserves every row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val src = s"$dir/src"
    val out = s"$dir/out"
    val df = (0L until 10000L).map(i => (i, s"row_$i")).toDF("id", "s")
    df.repartition(32).write.mode("overwrite").parquet(src)
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
    val nSrc = parquetFiles(src).length
    assert(nSrc == 32)
    val totalBytes = parquetFiles(src).map(_.length()).sum
    val target = totalBytes / 4 // expect ceil(total/target) = 4..5 files
    val compacted = LayoutOps.compact(spark, src, out, targetFileBytes = target)
    val nOut = parquetFiles(out).length
    assert(nOut == ((totalBytes + target - 1) / target).toInt,
      s"expected byte-sized file count, got $nOut")
    assert(nOut < nSrc)
    // content identical (row-level, order-free)
    assert(compacted.count() == 10000L)
    assert(compacted.except(df).isEmpty && df.except(compacted).isEmpty)
  }
}
