package graft.operators

/** Monotonic write-epoch counter for persisted index directories —
  * empty marker files `epochs/e1`, `epochs/e2`, … under the index
  * root: O(1), no table scan, deterministic across reruns (the value
  * depends only on how many mutations preceded it, never wall clock).
  * Appends and deletes both claim one, which is what lets a tombstone
  * mask exactly the rows that existed when the delete was issued —
  * shared by the ANN index ([[SimilarityOps]]) and the cross-epoch
  * dedup index ([[DedupOps]]). A production lake would use its
  * transaction log's commit id here — same monotonicity contract.
  *
  * Concurrency: `Files.createFile` is the atomic arbiter — two
  * writers who list the same max race on `e(m+1)`; the loser's
  * createFile throws `FileAlreadyExists` and RETRIES with the
  * refreshed max (CAS loop), so concurrent single-machine mutators
  * each get a distinct epoch instead of crashing. Non-numeric
  * `e*` names (editor droppings, partial copies) are ignored.
  *
  * [[reset]] (the bulk-rebuild path) is NOT part of that contract: it
  * deletes the counter directory non-atomically, so a rebuild requires
  * EXCLUSIVE access to the index — an appender racing a rebuild can
  * claim epoch 1 against half-reset state and its rows would be
  * indistinguishable from the rebuild's own. The CAS loop does tolerate
  * the benign half of the race (a `NoSuchFileException` from the
  * vanished directory re-creates it and retries) so a stray reader
  * never crashes, but epoch-numbering correctness during a rebuild is
  * the caller's lock to take, exactly as a lake's transaction log
  * serializes its own truncation. */
private[graft] object EpochLog {
  private val Name = "^e(\\d+)$".r

  def next(path: String): Long = {
    val dir = java.nio.file.Paths.get(path, "epochs")
    java.nio.file.Files.createDirectories(dir)
    var claimed = -1L
    while (claimed < 0) {
      try {
        val ls = java.nio.file.Files.list(dir)
        val m = try {
          var mx = 0L
          val it = ls.iterator()
          while (it.hasNext) {
            it.next().getFileName.toString match {
              case Name(d) => mx = math.max(mx, d.toLong)
              case _       => ()
            }
          }
          mx
        } finally ls.close()
        java.nio.file.Files.createFile(dir.resolve(s"e${m + 1}"))
        claimed = m + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // lost the race; re-list
        case _: java.nio.file.NoSuchFileException =>
          // a racing reset() deleted the dir between list and create —
          // re-create and retry (epoch numbering vs that rebuild is the
          // caller's lock, see class doc; this only keeps us crash-free)
          java.nio.file.Files.createDirectories(dir)
      }
    }
    claimed
  }

  /** Drop the counter entirely — bulk rebuilds call this so a
    * from-scratch index restarts at epoch 1 with no stale markers. */
  def reset(path: String): Unit = {
    val dir = java.nio.file.Paths.get(path, "epochs")
    if (java.nio.file.Files.isDirectory(dir)) {
      val ls = java.nio.file.Files.list(dir)
      try {
        val it = ls.iterator()
        while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
      } finally ls.close()
      java.nio.file.Files.deleteIfExists(dir)
      ()
    }
  }
}
