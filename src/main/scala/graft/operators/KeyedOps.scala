package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col

/** The MapReduce "secondary sort" on Spark: per-key processing where
  * the user function sees each key's rows IN ORDER, guaranteed by the
  * shuffle itself rather than by buffering and sorting inside the
  * function.
  *
  * `groupByKey(...).flatMapGroups` hands each group as an iterator but
  * promises nothing about row order, so every ordered fold ends up
  * doing `it.toArray.sortBy(...)` — per-group memory equal to the
  * largest key's history (fine for micro-batches, fatal for a 100 TB
  * key with deep history). Here the rows are hash-repartitioned on the
  * key and sorted (key, order) WITHIN partitions — one shuffle whose
  * sort is external (spillable) — and the fold walks equal-key runs
  * off the sorted stream with O(1) memory beyond its own state.
  */
object KeyedOps {

  /** Apply `f` to each key's rows, ordered by `order` (a (major, minor)
    * pair, e.g. (ts, event_id)). `f` receives a forward-only iterator;
    * rows it does not consume are skipped. Output is whatever `f`
    * emits, concatenated.
    *
    * @note scale: one shuffle on the key; within-partition sort spills
    *   through Spark's external sorter; no per-group materialization
    *   anywhere — per-task memory is the fold state, independent of the
    *   deepest key's history. */
  def mapSortedGroups[T: Encoder, U: Encoder](ds: Dataset[T], parts: Int)(
      key: T => Long, order: T => (Long, Long))(
      f: (Long, Iterator[T]) => Iterator[U]): Dataset[U] = {
    implicit val rowEnc: Encoder[(Long, Long, Long, T)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong,
      implicitly[Encoder[T]])
    ds.map { t => val (o1, o2) = order(t); (key(t), o1, o2, t) }
      .repartition(parts, col("_1"))
      .sortWithinPartitions("_1", "_2", "_3")
      .mapPartitions { it0 =>
        val it = it0.buffered
        new Iterator[U] {
          private var curOut: Iterator[U] = Iterator.empty
          private var curRun: Iterator[T] = Iterator.empty
          def hasNext: Boolean = {
            while (!curOut.hasNext && { while (curRun.hasNext) curRun.next(); it.hasNext }) {
              val k = it.head._1
              val run = new Iterator[T] {
                def hasNext: Boolean = it.hasNext && it.head._1 == k
                def next(): T = it.next()._4
              }
              curRun = run
              curOut = f(k, run)
            }
            curOut.hasNext
          }
          def next(): U = {
            if (!hasNext) throw new NoSuchElementException("empty group stream")
            curOut.next()
          }
        }
      }
  }
}
