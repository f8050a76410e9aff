package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The composed cleaning pipeline must converge INCREMENTALLY: a
  * 3-micro-batch replay of the documents table through
  * [[CleanPipeline.pipelineCleanIncremental]] ends at exactly the batch
  * `llm_pipeline_clean` report, and a duplicate document arriving in a
  * LATER batch than its original is dropped by the cross-batch dedup
  * state (the property single-batch equivalence specs cannot see). */
class CleanPipelineReplaySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def writeChunks(dir: String, chunks: Seq[DataFrame]): Unit =
    chunks.zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.parquet(s"$dir/part$i")
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }

  private def run(dir: String, schema: org.apache.spark.sql.types.StructType,
      minScoreU: Long): Seq[(String, Long, Long, Long)] = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/part*")
    val (tracker, writer) = CleanPipeline.pipelineCleanIncremental(src, minScoreU)
    val q = writer
      .option("checkpointLocation", Files.createTempDirectory("ckpt-clean").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    tracker.current
  }

  test("3-batch replay converges to the batch llm_pipeline_clean report") {
    val docs = Tables.documents(spark, sf).orderBy("doc_id")
    val rows = docs.collect()
    val dir = Files.createTempDirectory("cleanpipe").toString
    writeChunks(dir, rows.grouped(rows.length / 3 + 1).toSeq.map { chunk =>
      spark.createDataFrame(spark.sparkContext.parallelize(chunk.toSeq), docs.schema)
    })
    val got = run(dir, docs.schema, minScoreU = 500000L)
    val expected = SparkEntry.queries("llm_pipeline_clean")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expected, s"incremental report diverged:\n$got\nvs\n$expected")
  }

  test("cross-batch duplicate is dropped by the dedup state") {
    val sp = spark
    import sp.implicits._
    // batch 0: the original; batch 1: an exact duplicate under a new id
    // plus a fresh doc. All texts have distinct tokens so every doc
    // clears any quality bar; minScoreU=0 keeps the filter out of the way.
    val b0 = Seq((1L, "alpha beta gamma delta", "en", "web", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val b1 = Seq(
      (2L, "alpha beta gamma delta", "en", "web", 22L), // dup of doc 1
      (3L, "epsilon zeta eta theta", "en", "web", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("cleanpipe-dup").toString
    writeChunks(dir, Seq(b0, b1))
    val got = run(dir, b0.schema, minScoreU = 0L)
    // 2 docs survive (1 and 3), never the batch-1 duplicate
    assert(got.map(r => (r._1, r._2)) == Seq(("web", 2L)),
      s"expected 2 kept docs for source web, got $got")
  }
}
