package graft.operators

/** Monotonic write-epoch counter for persisted index directories —
  * empty marker files `epochs/e1`, `epochs/e2`, … under the index
  * root: O(1), no table scan, deterministic across reruns (the value
  * depends only on how many mutations preceded it, never wall clock).
  * Appends and deletes both claim one, which is what lets a tombstone
  * mask exactly the rows that existed when the delete was issued —
  * shared by the ANN index ([[SimilarityOps]]) and the cross-epoch
  * dedup index ([[DedupOps]]). A production lake would use its
  * transaction log's commit id here — same monotonicity contract. */
private[graft] object EpochLog {
  def next(path: String): Long = {
    val dir = java.nio.file.Paths.get(path, "epochs")
    java.nio.file.Files.createDirectories(dir)
    val ls = java.nio.file.Files.list(dir)
    val m = try {
      var mx = 0L
      val it = ls.iterator()
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.startsWith("e")) mx = math.max(mx, n.drop(1).toLong)
      }
      mx
    } finally ls.close()
    java.nio.file.Files.createFile(dir.resolve(s"e${m + 1}"))
    m + 1
  }
}
