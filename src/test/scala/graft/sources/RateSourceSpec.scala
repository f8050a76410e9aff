package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** SURVEY §2.1 S4: the rate/datagen source produces monotonically
  * increasing (timestamp, value) rows — smoke only, the source is
  * time-driven.
  */
class RateSourceSpec extends SparkSpec {

  test("S4 rate source emits increasing values") {
    val ckpt = Files.createTempDirectory("ckpt-rate").toString
    val q = Sources.rate(spark, rowsPerSecond = 200).writeStream
      .format("memory").queryName("rate_smoke").outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        q.processAllAvailable()
        n = spark.table("rate_smoke").count()
      }
      assert(n > 0, "rate source produced no rows in 15 s")
      val vals = spark.table("rate_smoke")
        .select("value").collect().map(_.getLong(0)).sorted
      assert(vals.distinct.length == vals.length, "values unique")
      assert(vals.head == 0L, "starts at 0")
    } finally q.stop()
  }
}
