package graft.operators

import graft.SparkSpec
import java.util.concurrent.atomic.AtomicInteger

/** Async-enrichment contract: output equals the synchronous map (same
  * rows, same order within a partition) while requests genuinely
  * overlap (observed in-flight high-water mark > 1). local[*] runs
  * executors in this JVM, so static counters observe the tasks. */
object EnrichProbe {
  val inFlight = new AtomicInteger(0)
  val highWater = new AtomicInteger(0)
  def slowLookup(x: Long): String = {
    val now = inFlight.incrementAndGet()
    highWater.updateAndGet(h => math.max(h, now))
    Thread.sleep(5)
    inFlight.decrementAndGet()
    s"enriched-$x"
  }
}

class EnrichOpsSpec extends SparkSpec {

  test("ordered async enrichment equals the sync map and overlaps requests") {
    import spark.implicits._
    val ds = (0L until 400L).toDS().repartition(4)
    EnrichProbe.highWater.set(0)
    val got = EnrichOps.asyncEnrich(ds, concurrency = 8)(EnrichProbe.slowLookup)
      .collect().sorted.toSeq
    val want = (0L until 400L).map(x => s"enriched-$x").sorted
    assert(got == want)
    assert(EnrichProbe.highWater.get() > 1,
      s"requests never overlapped (highWater=${EnrichProbe.highWater.get()})")
  }

  test("concurrency 1 degrades to the sequential map") {
    import spark.implicits._
    val ds = (0L until 20L).toDS().coalesce(1)
    val got = EnrichOps.asyncEnrich(ds, concurrency = 1)(x => x * 2)
      .collect().toSeq
    assert(got == (0L until 20L).map(_ * 2)) // order preserved exactly
  }

  test("boundedLookupMap: under the cap materializes, over the cap fails loudly") {
    import spark.implicits._
    val dim = (0L until 100L).map(k => (k, s"seg-$k")).toDF("k", "v")
    val m = EnrichOps.boundedLookupMap(dim, "k", "v", maxDriverRows = 100)
    assert(m.size == 100 && m(7L) == "seg-7")
    val e = intercept[IllegalArgumentException] {
      EnrichOps.boundedLookupMap(dim, "k", "v", maxDriverRows = 99)
    }
    assert(e.getMessage.contains("maxDriverRows"))
  }
}
