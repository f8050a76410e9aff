package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Pins for the cross-epoch dedup index: the row-local MinHash
  * signature/banding must be BIT-IDENTICAL to the UDAF the batch LSH
  * route uses (same permutation arithmetic — a divergence would
  * silently change recall), the persisted round-trip must serve the
  * same pairs the in-session operators find, and the append path must
  * make later batches dedup against earlier keepers.
  */
class DedupIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)

  test("rowBands == the MinHashSig UDAF banding, byte for byte") {
    val viaRows = DedupOps.rowBands(DedupOps.shingleSets(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val M = 2147483647L
    val minhashSig = udaf(
      graft.functions.SketchAggregators.MinHashSig, Encoders.scalaLong)
    val viaUdaf = DedupOps.hashedShingles(docs)
      .withColumn("x", col("h") % M)
      .groupBy("doc_id").agg(minhashSig(col("x")).as("sig"))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(15))).as("band"), col("sig"))
      .withColumn("bsig", expr(
        "concat_ws(',', transform(slice(sig, band*4 + 1, 4), v -> CAST(v AS STRING)))"))
      .select("doc_id", "band", "bsig")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaRows == viaUdaf,
      s"banding arithmetic diverged on ${(viaRows -- viaUdaf).size + (viaUdaf -- viaRows).size} rows")
  }

  test("saved-index serve == in-session cross-epoch pairs; self-pairs impossible") {
    val path = java.nio.file.Files.createTempDirectory("dedup-idx").toString
    val old = docs.filter(col("doc_id") % 2 === 0)
    val nw = docs.filter(col("doc_id") % 2 === 1)
    DedupOps.saveDedupIndex(old, path)
    val served = DedupOps.dedupAgainstIndex(nw, path, minJaccard = 0.5)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // in-session reference: whole-corpus LSH pairs restricted cross-epoch
    val ref = DedupOps.minhashNearDups(docs, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        if (a % 2 == 1 && b % 2 == 0) Some((a, b, j))
        else if (b % 2 == 1 && a % 2 == 0) Some((b, a, j))
        else None
      }.toSet
    assert(served == ref,
      s"persisted serve diverged: extra=${served -- ref} missing=${ref -- served}")
    assert(served.forall { case (a, b, _) => a % 2 == 1 && b % 2 == 0 })
  }

  test("append: the next batch dedups against earlier keepers") {
    val path = java.nio.file.Files.createTempDirectory("dedup-idx-app").toString
    // epoch 1: thirds 0; batch A: thirds 1; batch B: thirds 2
    DedupOps.saveDedupIndex(docs.filter(col("doc_id") % 3 === 0), path)
    val batchA = docs.filter(col("doc_id") % 3 === 1)
    DedupOps.appendToDedupIndex(batchA, path)
    val batchB = docs.filter(col("doc_id") % 3 === 2)
    val served = DedupOps.dedupAgainstIndex(batchB, path, minJaccard = 0.5)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rebuilt = java.nio.file.Files.createTempDirectory("dedup-idx-reb").toString
    DedupOps.saveDedupIndex(docs.filter(col("doc_id") % 3 =!= 2), rebuilt)
    val want = DedupOps.dedupAgainstIndex(batchB, rebuilt, minJaccard = 0.5)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served == want, "append-maintained index != rebuilt index")
    assert(want.nonEmpty, "fixture must contain cross-epoch pairs at 0.5")
  }

  test("delete path: tombstones mask, re-crawl serves without compaction, compaction preserves") {
    val path = java.nio.file.Files.createTempDirectory("dedup-idx-del").toString
    val old = docs.filter(col("doc_id") % 2 === 0)
    val nw = docs.filter(col("doc_id") % 2 === 1)
    DedupOps.saveDedupIndex(old, path)
    def serve() = DedupOps.dedupAgainstIndex(nw, path, minJaccard = 0.5)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = serve()
    assert(before.nonEmpty, "fixture must contain cross-epoch pairs")
    // take down every indexed doc that currently serves as a match
    val doomedIds = before.map(_._2).toSeq
    val sp = spark
    import sp.implicits._
    DedupOps.deleteFromDedupIndex(doomedIds.toDF("doc_id"), path)
    assert(serve().isEmpty, "tombstoned docs must stop serving")
    // re-crawl ONE of them: it must serve again with ZERO compaction
    // (its re-append epoch outranks the tombstone)
    val back = doomedIds.head
    DedupOps.appendToDedupIndex(docs.filter(col("doc_id") === back), path)
    val after = serve()
    assert(after == before.filter(_._2 == back),
      s"re-crawled doc must serve immediately: $after")
    // compaction folds the masked rows out and PRESERVES the re-crawl
    DedupOps.compactDedupIndex(spark, path)
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(path, "tombstones")))
    assert(serve() == after, "compaction changed the served pairs")
    // a SECOND delete outranks the re-crawl
    DedupOps.deleteFromDedupIndex(Seq(back).toDF("doc_id"), path)
    assert(serve().isEmpty, "newer tombstone must mask the re-crawl")
  }
}
