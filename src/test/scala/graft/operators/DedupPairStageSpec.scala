package graft.operators

import graft.{SparkSpec, Tables}

/** The broadcast pair-stage kernels must reproduce their declarative
  * theta-join twins exactly — same pair set, same metric values. */
class DedupPairStageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("simhash broadcast kernel equals the theta join exactly") {
    val docs = Tables.documents(spark, sf)
    val kernel = DedupOps.simhashNearDups(docs, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val join = DedupOps.simhashNearDupsJoin(docs, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(kernel.nonEmpty, "planted near-dups should surface")
    assert(kernel == join)
  }

  test("banded simhash equals the broadcast kernel (pigeonhole is exact)") {
    val docs = Tables.documents(spark, sf)
    for (hm <- Seq(3, 10)) { // different band counts / widths
      val kernel = DedupOps.simhashNearDups(docs, maxHamming = hm)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val banded = DedupOps.simhashNearDupsBanded(docs, maxHamming = hm)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == kernel, s"maxHamming=$hm banded diverged")
    }
  }
}
