package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import java.nio.file.Files

/** [[StreamOps.observed]] — Flink-metrics parity: named aggregates ride
  * the running job via accumulators and surface per micro-batch in
  * `observedMetrics`, with no second pass over the data.
  */
class ObservedMetricsSpec extends SparkSpec {

  test("streaming observe reports per-batch count/sum/bad-rows") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[(String, Double)]

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double, Long)]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics.get("pipe_stats")
        if (m != null)
          seen.add((e.progress.batchId, m.getLong(0), m.getDouble(1), m.getLong(2)))
      }
    }
    sp.streams.addListener(listener)

    val observedDf = StreamOps.observed(input.toDF().toDF("k", "v"),
      "pipe_stats",
      count(lit(1)).as("n_rows"),
      sum(col("v")).as("v_sum"),
      count(when(col("v") < 0, 1)).as("n_bad"))
    val q = observedDf.writeStream.format("noop")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-obs").toString)
      .start()
    try {
      input.addData("a" -> 1.0, "b" -> 2.5, "c" -> -1.0)
      q.processAllAvailable()
      input.addData("d" -> 4.0)
      q.processAllAvailable()
      // listener events are async — wait for both batches to land
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.size < 2 && System.nanoTime() < deadline) Thread.sleep(50)
    } finally {
      q.stop(); sp.streams.removeListener(listener)
    }
    val byBatch = seen.toArray(Array.empty[(Long, Long, Double, Long)])
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(byBatch(0L) == ((3L, 2.5, 1L)), s"batch 0 metrics: ${byBatch.get(0L)}")
    assert(byBatch(1L) == ((1L, 4.0, 0L)), s"batch 1 metrics: ${byBatch.get(1L)}")
  }

  test("batch observe surfaces the same metrics via QueryExecutionListener") {
    val sp = spark
    import sp.implicits._
    @volatile var got: Option[(Long, Double)] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("batch_stats").foreach { r =>
          got = Some((r.getLong(0), r.getDouble(1)))
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    sp.listenerManager.register(listener)
    try {
      StreamOps.observed(Seq(1.0, 2.0, 3.5).toDF("v"), "batch_stats",
        count(lit(1)).as("n"), sum(col("v")).as("s"))
        .write.format("noop").mode("overwrite").save()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (got.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    } finally sp.listenerManager.unregister(listener)
    assert(got.contains((3L, 6.5)), s"batch metrics: $got")
  }
}
