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
