package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Accuracy gates for the KMV set-algebra key (`agg_kmv_setops`).
  * Cross-engine parity is the oracle's job; here:
  *  - the sf0.01 fixture sits in the DEGENERATE regime (150 distinct
  *    users < k=256), where every estimate must equal the exact count;
  *  - a synthetic corpus with 4000/3000 distinct keys and a planted
  *    1000-key overlap exercises the real estimator, gated at 3σ of
  *    the union SE plus the binomial intersection-fraction SE.
  */
class KmvSetopsSpec extends SparkSpec {

  test("degenerate regime: below k the algebra returns exact counts") {
    val r = SparkEntry.queries("agg_kmv_setops")(spark, "/root/testdata/sf0.01")
      .head()
    // all 150 users both click and purchase in this fixture
    assert(r.getDouble(0) == 150.0, s"union ${r.getDouble(0)}")
    assert(r.getDouble(1) == 150.0, s"intersection ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.0, s"click-only ${r.getDouble(2)}")
  }

  test("estimation regime: union/intersection/difference within 3 sigma") {
    import spark.implicits._
    val k = 256
    val kmv = new graft.functions.SketchAggregators.BottomK(k)
    // A = 1..4000, B = 3001..6000 → union 6000, both 1000, aOnly 3000
    val a = (1L to 4000L)
    val b = (3001L to 6000L)
    def sketch(xs: Seq[Long]): Seq[Long] =
      spark.createDataset(xs).groupByKey(_ => 0).mapValues(identity)
        .agg(kmv.toColumn.name("sk")).collect().head._2
    val ka = sketch(a).toSet
    val kb = sketch(b).toSet
    val u = (ka ++ kb).toSeq.sorted.take(k)
    val nv = u.size
    val eu =
      if (nv < k) nv.toDouble
      else 255.0 * 2147483647.0 / u.last.toDouble
    val nboth = u.count(h => ka(h) && kb(h))
    val nonly = u.count(h => ka(h) && !kb(h))
    val eBoth = nboth.toDouble * eu / nv
    val eOnly = nonly.toDouble * eu / nv
    val seU = eu / math.sqrt(k - 2)
    assert(math.abs(eu - 6000.0) <= 3 * seU, s"union $eu vs 6000")
    // fraction SE: binomial on k draws at rho ≈ 1/6 and 1/2
    def tol(rho: Double) =
      3 * (math.sqrt(rho * (1 - rho) / k) * 6000.0 + rho * seU)
    assert(math.abs(eBoth - 1000.0) <= tol(1.0 / 6), s"both $eBoth vs 1000")
    assert(math.abs(eOnly - 3000.0) <= tol(0.5), s"aOnly $eOnly vs 3000")
  }
}
