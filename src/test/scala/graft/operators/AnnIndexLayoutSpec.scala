package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import scala.jdk.CollectionConverters._

/** Pins for the saved ANN index's STORAGE layout and versioned delete
  * semantics:
  *
  *  - `assigned/` is written `partitionBy("cid")`, and both a static
  *    cid filter and the serve path's probed-cell `IN` list
  *    partition-prune the scan — a 1-cell probe reads that cell's
  *    files, not the corpus (the claim [[SimilarityOps.knnIvfSaved]]'s
  *    scale note makes must be true of the actual layout).
  *  - tombstones are EPOCH-VERSIONED: a delete masks exactly the rows
  *    that existed when it was issued, so delete → re-append serves
  *    the re-inserted vector immediately (no compaction), on both
  *    serve kernels, and compaction preserves the re-insert.
  */
class AnnIndexLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sf)

  private def parquetFilesUnder(dir: String): Seq[java.nio.file.Path] = {
    val root = java.nio.file.Paths.get(dir)
    val walk = java.nio.file.Files.walk(root)
    try {
      val b = Seq.newBuilder[java.nio.file.Path]
      walk.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.endsWith(".parquet")) b += p
      }
      b.result()
    } finally walk.close()
  }

  test("assigned/ is cid-partitioned and a cell filter prunes the scan to that cell's files") {
    val path = java.nio.file.Files.createTempDirectory("ivf-layout").toString
    SimilarityOps.saveIvfIndex(emb, path, nCells = 8, iters = 2)
    val cellDirs = {
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(s"$path/assigned"))
      try ls.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("cid=")).toSeq
      finally ls.close()
    }
    assert(cellDirs.nonEmpty, "assigned/ must be laid out as cid= partition dirs")
    val someCid = cellDirs.head.stripPrefix("cid=").toLong
    val totalFiles = parquetFilesUnder(s"$path/assigned").size
    val oneCellFiles =
      parquetFilesUnder(s"$path/assigned/cid=$someCid").size
    val pruned = spark.read.parquet(s"$path/assigned")
      .filter(col("cid") === someCid)
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no file scan in the pruned plan"))
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead == oneCellFiles && filesRead < totalFiles,
      s"1-cell filter read $filesRead files (cell has $oneCellFiles, " +
        s"table has $totalFiles) — partition pruning is not happening")
  }

  test("knnIvfSaved pushes the probed cells as a static partition filter") {
    val path = java.nio.file.Files.createTempDirectory("ivf-probe-prune").toString
    SimilarityOps.saveIvfIndex(emb, path, nCells = 8, iters = 2)
    val served = SimilarityOps.knnIvfSaved(emb, path,
      isQuery = col("vec_id") === 0, nprobe = 2, k = 5)
    val planStr = served.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(planStr).isDefined,
      s"serve plan must partition-filter assigned/ on cid:\n$planStr")
    // and the pruned serve answers exactly like the full det path
    val direct = SimilarityOps.knnIvfDet(emb, isQuery = col("vec_id") === 0,
        nCells = 8, iters = 2, nprobe = 2, k = 5)
      .collect().map(_.toSeq).toSet
    assert(served.collect().map(_.toSeq).toSet == direct)
  }

  test("knnIvfSaved's probe collect fails loudly past maxProbeRows, naming the distributed routes") {
    val path = java.nio.file.Files.createTempDirectory("ivf-probe-cap").toString
    SimilarityOps.saveIvfIndex(emb, path, nCells = 8, iters = 2)
    val e = intercept[IllegalArgumentException] {
      // every vector a query × nprobe=2 ≫ a 3-row cap
      SimilarityOps.knnIvfSaved(emb, path, isQuery = lit(true),
        nprobe = 2, k = 5, maxProbeRows = 3)
    }
    assert(e.getMessage.contains("maxProbeRows") &&
      e.getMessage.contains("knnLookupIvf") &&
      e.getMessage.contains("knnIvfDet"),
      s"cap must name the scale-safe alternatives: ${e.getMessage}")
  }

  test("versioned tombstones: delete -> re-append serves WITHOUT compaction, both kernels") {
    val path = graft.Scratch.dirString("graft-ivf-epoch")
    SimilarityOps.saveIvfIndex(emb, path, nCells = 8, iters = 2)
    val victims = emb.filter(col("vec_id") % 10 === 7)
    SimilarityOps.deleteFromIvfIndex(victims.select("vec_id"), path)
    def serveJoin() = SimilarityOps.knnIvfSaved(emb, path,
        isQuery = col("vec_id") < 5, nprobe = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    def serveMem() = SimilarityOps.knnLookupIvf(
        emb.filter(col("vec_id") < 5), path, nprobe = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(!serveJoin().exists(_._2 % 10 == 7), "delete must mask victims")
    // re-insert the deleted ids: they must serve IMMEDIATELY (their
    // append epoch outranks the tombstone), with zero compaction
    SimilarityOps.appendToIvfIndex(
      SimilarityOps.ivfAssignSaved(victims, path), path)
    val fresh = java.nio.file.Files.createTempDirectory("ivf-fresh").toString
    SimilarityOps.saveIvfIndex(emb, fresh, nCells = 8, iters = 2)
    val want = SimilarityOps.knnIvfSaved(emb, fresh,
        isQuery = col("vec_id") < 5, nprobe = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(serveJoin() == want,
      "join-form serve after delete+re-append must equal the rebuild")
    assert(serveMem() == want,
      "in-memory serve after delete+re-append must equal the rebuild")
    // compaction folds the masked rows out but KEEPS the re-insert
    SimilarityOps.compactIvfIndex(spark, path)
    assert(serveJoin() == want, "compaction must preserve the re-insert")
    // a SECOND delete outranks the re-append and masks it again
    SimilarityOps.deleteFromIvfIndex(victims.select("vec_id"), path)
    assert(!serveJoin().exists(_._2 % 10 == 7),
      "a newer tombstone must mask the earlier re-insert")
  }

  test("rebuild-in-place after deletes serves fresh rows (stale tombstones reset)") {
    val path = java.nio.file.Files.createTempDirectory("ivf-rebuild").toString
    SimilarityOps.saveIvfIndex(emb, path, nCells = 8, iters = 2)
    def serve() = SimilarityOps.knnIvfSaved(emb, path,
        isQuery = col("vec_id") < 5, nprobe = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val fresh = serve()
    assert(fresh.nonEmpty)
    // delete every served neighbor, then REBUILD in place: without
    // the bulk build resetting tombstones/ + epochs/, the surviving
    // tombstones (epoch >= 1) would mask every fresh epoch-0 row
    val sp = spark
    import sp.implicits._
    SimilarityOps.deleteFromIvfIndex(
      fresh.map(_._2).toSeq.toDF("vec_id"), path)
    assert(serve() != fresh, "deletes must change the served set")
    SimilarityOps.saveIvfIndex(emb, path, nCells = 8, iters = 2)
    assert(serve() == fresh,
      "in-place rebuild must serve exactly what a fresh-path build serves")
  }
}
