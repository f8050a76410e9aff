package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Flink `AsyncDataStream.orderedWait` parity: enrichment against a
  * slow external lookup (REST service, KV store) with bounded
  * per-partition concurrency. A plain `map` serializes the latency —
  * 1000 rows × 20 ms = 20 s per task; here each task keeps up to
  * `concurrency` requests in flight and still emits results in input
  * order, so the output is deterministic and downstream operators see
  * the same rows as the synchronous form.
  *
  * @note scale: concurrency is PER TASK — total in-flight against the
  *   service is tasks × concurrency; size it from the service's rate
  *   budget, not the cluster's. Failures propagate after `timeout`
  *   (fail-the-task → Spark retry), matching Flink's async-timeout
  *   semantics. For services with batch endpoints, batch inside
  *   `fetch` instead of raising concurrency.
  */
object EnrichOps {

  /** Materialize a small keyed dimension as the driver-map stand-in for
    * the external KV service [[asyncEnrich]]'s `fetch` probes in tests.
    * The collect is BOUNDED: at most `maxDriverRows + 1` rows ever reach
    * the driver (`limit` pushes into the scan), and exceeding the cap is
    * an explicit error instead of a driver OOM — at 100× scale a real
    * remote store replaces this map entirely, so the cap marks the
    * test-path boundary the same way the SimHash kernel guard does.
    *
    * @note scale: driver memory is the cap × entry size, independent of
    *   the dimension's true cardinality. */
  def boundedLookupMap(df: org.apache.spark.sql.DataFrame, keyCol: String,
      valCol: String, maxDriverRows: Int = 2000000): Map[Long, String] = {
    val rows = df.select(keyCol, valCol).limit(maxDriverRows + 1).collect()
    require(rows.length <= maxDriverRows,
      s"lookup dimension exceeds maxDriverRows=$maxDriverRows — a driver-map " +
        "stand-in cannot hold it; point asyncEnrich's fetch at the real " +
        "external store (or raise the cap if the driver genuinely has room)")
    rows.map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  def asyncEnrich[T, U: Encoder](ds: Dataset[T], concurrency: Int,
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(5, "min"))(
      fetch: T => U): Dataset[U] = {
    require(concurrency >= 1, "concurrency must be >= 1")
    ds.mapPartitions { it =>
      import scala.concurrent.{Await, ExecutionContext, Future}
      // daemon threads + a task-completion hook: a downstream limit()
      // that stops consuming mid-partition, or a fetch failure, must
      // not leak live non-daemon threads across task retries
      val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency,
        (r: Runnable) => { val t = new Thread(r, "graft-async-enrich"); t.setDaemon(true); t })
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      val ec = ExecutionContext.fromExecutorService(pool)
      val inflight = scala.collection.mutable.Queue.empty[Future[U]]
      new Iterator[U] {
        private def fill(): Unit =
          while (inflight.size < concurrency && it.hasNext) {
            val t = it.next()
            inflight += Future(fetch(t))(ec)
          }
        def hasNext: Boolean = {
          fill()
          if (inflight.isEmpty) { pool.shutdown(); false } else true
        }
        def next(): U = {
          if (!hasNext) throw new NoSuchElementException("drained")
          val out = Await.result(inflight.dequeue(), timeout)
          fill() // keep the window full while we hand rows downstream
          out
        }
      }
    }
  }
}
