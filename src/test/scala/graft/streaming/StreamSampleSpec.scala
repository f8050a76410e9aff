package graft.streaming

import graft.SparkSpec
import graft.operators.SampleOps
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Stream-sampling contract: hash sampling is a pure function of the
  * row id, so replaying a sampled stream yields EXACTLY the batch
  * sample of the same input — no dependence on micro-batch boundaries.
  */
class StreamSampleSpec extends SparkSpec {

  test("stream hash-sample replay equals the batch sample") {
    val sp = spark
    import sp.implicits._
    val inDir = Files.createTempDirectory("ssample-in").toString
    val outDir = Files.createTempDirectory("ssample-out").toString
    val ckpt = Files.createTempDirectory("ssample-ckpt").toString

    val df = (0L until 1000L).map(i => (i, s"p$i")).toDF("event_id", "payload")
    // two files → two micro-batches under maxFilesPerTrigger=1
    df.filter($"event_id" < 500).coalesce(1).write.mode("append").parquet(inDir)
    df.filter($"event_id" >= 500).coalesce(1).write.mode("append").parquet(inDir)

    val src = spark.readStream.schema("event_id LONG, payload STRING")
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = StreamOps.hashSample(src, rate = 0.25).writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.read.parquet(outDir)
      .select("event_id").as[Long].collect().sorted.toSeq
    val batch = SampleOps.hashSample(df, rate = 0.25, idCol = "event_id")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(streamed == batch)
    // sanity: a real sample, not empty / not everything
    assert(streamed.nonEmpty && streamed.size < 1000)
  }
}
