package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the marker-file epoch counter shared by the ANN and dedup
  * indexes: concurrent mutators must each claim a DISTINCT epoch (the
  * atomic `createFile` arbitrates; losers retry with the refreshed
  * max), junk filenames in `epochs/` must not crash the listing, and
  * `reset` must restart the counter for bulk rebuilds. */
class EpochLogSpec extends AnyFunSuite {

  test("concurrent writers claim distinct, gap-free epochs (CAS retry)") {
    val path = java.nio.file.Files.createTempDirectory("epochlog-race").toString
    val threads = 8
    val perThread = 25
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val futures = (0 until threads).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit =
          (0 until perThread).foreach(_ => claimed.add(EpochLog.next(path)))
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    val got = {
      val it = claimed.iterator()
      val b = Seq.newBuilder[Long]
      while (it.hasNext) b += it.next()
      b.result().sorted
    }
    assert(got == (1L to (threads * perThread).toLong),
      s"epochs must be distinct and gap-free, got ${got.take(10)}...")
  }

  test("non-numeric files in epochs/ are ignored, not a crash") {
    val path = java.nio.file.Files.createTempDirectory("epochlog-junk").toString
    assert(EpochLog.next(path) == 1L)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(path, "epochs", "e1.tmp"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(path, "epochs", "editor~"))
    assert(EpochLog.next(path) == 2L)
  }

  test("reset restarts the counter at 1") {
    val path = java.nio.file.Files.createTempDirectory("epochlog-reset").toString
    assert(EpochLog.next(path) == 1L)
    assert(EpochLog.next(path) == 2L)
    EpochLog.reset(path)
    assert(EpochLog.next(path) == 1L)
  }
}
