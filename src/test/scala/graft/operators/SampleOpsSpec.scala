package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic properties of the r7 sampling additions — the oracle keys
  * pin cross-engine bit-parity; these pin the statistics. */
class SampleOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def docs = Tables.documents(spark, sf)

  test("temperature mixture upsamples low-mass strata, expected mass ~ targetFrac") {
    val n = docs.count().toDouble
    val kept = SampleOps.temperatureMixture(docs, targetFrac = 0.5)
    val k = kept.count().toDouble
    // hash sampling is Bernoulli per row; 3 sigma around 0.5N
    assert(math.abs(k - 0.5 * n) <= 3 * math.sqrt(0.25 * n),
      s"kept $k of $n, expected ~${0.5 * n}")
    // per-stratum keep RATE must be anti-monotone in stratum mass:
    // tau = 0.5 gives rate ∝ 1/sqrt(n)
    val by = docs.groupBy("source").count()
      .join(kept.groupBy("source").agg(count(lit(1)).as("k")), Seq("source"))
      .collect().map(r => (r.getLong(1), r.getLong(2).toDouble / r.getLong(1)))
    for (Seq((nA, rA), (nB, rB)) <- by.sortBy(_._1).toSeq.combinations(2)
         if nB > nA * 2) // well-separated masses; sampling noise can't flip
      assert(rA >= rB, s"stratum with n=$nA must keep at a rate >= n=$nB ($rA vs $rB)")
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
