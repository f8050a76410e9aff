package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.functions.SketchAggregators.CountMin

/** Bound relationships of the count-min estimator family.
  *
  * The distributed keys ship two estimators over the SAME mergeable
  * counters: plain min (`agg_cms_mergeable`, never under-estimates) and
  * count-mean-min (`agg_cms_meanmin`, debiased + clamped, so
  * `est_cmm ≤ est_n` by construction). The third classical variant —
  * CONSERVATIVE UPDATE — increments only the currently-minimal cells,
  * which makes the final counters a function of stream ORDER: two
  * partitionings of one multiset give two different sketches, and
  * elementwise-add merge no longer preserves its invariant (it is not a
  * mergeable summary in the Agarwal et al. sense). That rules it out as
  * a distributed operator under this library's cross-engine determinism
  * contract, so its bound relationship is pinned here against a
  * sequential reference instead of an oracle key.
  */
class CmsVariantsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("CMM ≤ plain min per probe; plain min ≥ exact; CMM far closer in the collided regime") {
    val rows = SparkEntry.queries("agg_cms_meanmin")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = graft.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_custkey") < 5)
      .groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == 5)
    rows.foreach { case (k, estN, estCmm) =>
      assert(estCmm <= estN.toDouble + 1e-9, s"key $k: cmm $estCmm > min $estN")
      assert(estN >= exact(k), s"key $k: plain min under-estimated")
    }
    val cmsErr = rows.map { case (k, estN, _) => math.abs(estN - exact(k)) }.sum
    val cmmErr = rows.map { case (k, _, c) => math.abs(c - exact(k)) }.sum
    assert(cmmErr < cmsErr / 5,
      s"collided-regime debias should dominate: cmm err $cmmErr vs cms err $cmsErr")
  }

  /** Sequential conservative-update reference on a tiny skewed stream:
    * per-cell counters never exceed the plain sketch's, and point
    * estimates keep the ≥-truth guarantee while never exceeding the
    * plain estimates. */
  test("conservative update (sequential reference): cells ≤ plain, truth ≤ est_cons ≤ est_plain") {
    val depth = 4
    val width = 16 // narrow on purpose — forces collisions
    val counts: Map[Long, Int] =
      (Map(1L -> 50, 2L -> 30, 3L -> 11) ++ (10L to 40L).map(_ -> 1).toMap)
    // canonical stream order: by key, each key's occurrences adjacent
    val stream = counts.toSeq.sortBy(_._1).flatMap { case (k, n) => Seq.fill(n)(k) }

    val plain = new Array[Long](depth * width)
    stream.foreach { x =>
      (0 until depth).foreach(i => plain(i * width + CountMin.cell(x, i, width)) += 1L)
    }
    val cons = new Array[Long](depth * width)
    stream.foreach { x =>
      val cells = (0 until depth).map(i => i * width + CountMin.cell(x, i, width))
      val est = cells.map(cons).min + 1L
      cells.foreach(c => if (cons(c) < est) cons(c) = est)
    }
    (0 until depth * width).foreach { p =>
      assert(cons(p) <= plain(p), s"cell $p: conservative exceeded plain")
    }
    counts.foreach { case (k, n) =>
      val ep = CountMin.estimate(plain.toIndexedSeq, depth, width, k)
      val ec = CountMin.estimate(cons.toIndexedSeq, depth, width, k)
      assert(n <= ec, s"key $k: conservative under-estimated ($ec < $n)")
      assert(ec <= ep, s"key $k: conservative above plain")
    }
  }

  /** The order-dependence that disqualifies conservative update as a
    * distributed operator, demonstrated: two orderings of the SAME
    * multiset produce different sketches. */
  test("conservative update is stream-order-dependent (why it is not a key)") {
    val depth = 2
    val width = 8
    val a = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 1L, 1L)
    def build(s: Seq[Long]): Seq[Long] = {
      val buf = new Array[Long](depth * width)
      s.foreach { x =>
        val cells = (0 until depth).map(i => i * width + CountMin.cell(x, i, width))
        val est = cells.map(buf).min + 1L
        cells.foreach(c => if (buf(c) < est) buf(c) = est)
      }
      buf.toSeq
    }
    assert(build(a) != build(a.reverse),
      "expected order dependence on this stream — if equal, pick a different fixture")
  }
}
