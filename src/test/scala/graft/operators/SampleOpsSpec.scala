package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic properties of the r7 sampling additions — the oracle keys
  * pin cross-engine bit-parity; these pin the statistics. */
class SampleOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def docs = Tables.documents(spark, sf)

  // The documents fixture's strata are perfectly uniform (20 × 25 docs),
  // where temperature is a mathematical no-op — so the statistics are
  // asserted on a deliberately skewed synthetic corpus instead.
  private def skewed = {
    val sp = spark
    import sp.implicits._
    (0L until 1000L).map { id =>
      (id, if (id < 800) "web" else if (id < 950) "books" else "code")
    }.toDF("doc_id", "source")
  }

  test("temperature mixture upsamples low-mass strata, expected mass ~ targetFrac") {
    val df = skewed
    val n = df.count().toDouble
    val kept = SampleOps.temperatureMixture(df, targetFrac = 0.5)
    val k = kept.count().toDouble
    // hash sampling is Bernoulli per row; 4 sigma around 0.5N (the
    // min(1, .) clamp can only lower the expectation slightly)
    assert(math.abs(k - 0.5 * n) <= 4 * math.sqrt(0.25 * n),
      s"kept $k of $n, expected ~${0.5 * n}")
    // per-stratum keep RATE anti-monotone in stratum mass (tau = 0.5
    // gives rate ∝ 1/sqrt(n); masses 800/150/50 are far enough apart
    // that sampling noise cannot flip the order)
    val by = df.groupBy("source").count()
      .join(kept.groupBy("source").agg(count(lit(1)).as("k")), Seq("source"))
      .collect().map(r => (r.getLong(1), r.getLong(2).toDouble / r.getLong(1)))
    for (Seq((nA, rA), (nB, rB)) <- by.sortBy(_._1).toSeq.combinations(2))
      assert(rA >= rB - 0.05, s"n=$nA rate $rA must be >= n=$nB rate $rB")
  }

  test("quarter-power temperatures order by flatness; general pow is rejected") {
    val df = skewed
    // tau=1 is the natural mixture (uniform keep-rate across strata);
    // dropping tau steepens low-mass upsampling, so the max/min rate
    // RATIO of the driver-side rates table must grow as tau drops.
    // Assert on the exact rates (not sampled counts) — noise-free.
    def rateSpread(tau: Double): Double = {
      val counts = df.groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val kept = SampleOps.temperatureMixture(df, targetFrac = 0.4, tau = tau)
      // recover realized per-stratum rates from hash membership is noisy;
      // instead recompute the closed-form rate and check the op agrees
      // on totals within noise
      val w = counts.map { case (s2, n2) => s2 -> math.pow(n2.toDouble, tau) }
      val bigW = w.toSeq.sortBy(_._1).map(_._2).sum
      val rates = counts.map { case (s2, n2) =>
        math.min(1.0, 0.4 * 1000 / bigW * w(s2) / n2) }
      rates.max / rates.min
    }
    val r25 = rateSpread(0.25)
    val r75 = rateSpread(0.75)
    val r1 = rateSpread(1.0)
    assert(r1 <= r75 && r75 <= r25,
      s"rate ratio must grow as tau drops: tau=1 $r1, tau=0.75 $r75, tau=0.25 $r25")
    // and the tau=0.75 sampled mass still lands near target
    val k = SampleOps.temperatureMixture(df, targetFrac = 0.4, tau = 0.75).count()
    assert(math.abs(k - 400) <= 4 * math.sqrt(0.24 * 1000), s"kept $k, expected ~400")
    intercept[RuntimeException] {
      SampleOps.temperatureMixture(df, targetFrac = 0.5, tau = 0.6).count()
    }
  }

  test("epoch shuffle is a reproducible bijection with contiguous in-shard positions") {
    val e1 = SampleOps.epochShuffle(docs, nShards = 8, epoch = 7L)
      .select("doc_id", "shard", "pos")
    val rows = e1.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.length == docs.count(), "every row assigned exactly once")
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length),
        s"shard $shard positions must be contiguous 1..${rs.length}")
    }
    // reproducible within an epoch, different across epochs
    val again = SampleOps.epochShuffle(docs, nShards = 8, epoch = 7L)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(again.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
    val other = SampleOps.epochShuffle(docs, nShards = 8, epoch = 8L)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(other.sortBy(_._1).toSeq != rows.sortBy(_._1).toSeq,
      "a different epoch must yield a different order")
  }
}
