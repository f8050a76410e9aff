package graft.operators

import graft.SparkSpec

/** mapSortedGroups contract: rows arrive per key in (major, minor)
  * order; a function that stops consuming mid-run skips the rest of
  * that run without corrupting the next one; empty outputs are fine. */
class KeyedOpsSpec extends SparkSpec {

  test("ordered runs, partial consumption, and empty outputs") {
    import spark.implicits._
    // 100 keys × 20 rows, inserted shuffled so the sort has work to do
    val rows = (for (k <- 0L until 100L; i <- 0L until 20L)
      yield (k, i, s"v-$k-$i")).toSeq
    val ds = scala.util.Random.shuffle(rows).toDS()

    // full consumption: concatenation respects the order
    val full = KeyedOps.mapSortedGroups(ds, parts = 7)(
      key = _._1, order = t => (t._2, 0L)) { (k, it) =>
      Iterator.single(k -> it.map(_._3).mkString(","))
    }.collect().toMap
    assert(full.size == 100)
    assert(full(42L) == (0L until 20L).map(i => s"v-42-$i").mkString(","))

    // partial consumption: take only the first row of each run; odd
    // keys emit nothing — the next run must still start clean
    val partial = KeyedOps.mapSortedGroups(ds, parts = 7)(
      key = _._1, order = t => (t._2, 0L)) { (k, it) =>
      if (k % 2 == 1) Iterator.empty
      else Iterator.single(k -> it.next()._3)
    }.collect().toMap
    assert(partial.size == 50)
    assert(partial.forall { case (k, v) => v == s"v-$k-0" })
  }
}
