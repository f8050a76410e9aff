package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Cross-batch state correctness: the single-file equivalence specs run
  * one micro-batch, which never exercises watermark advancement or
  * state merging ACROSS batches. Here the events are split into three
  * time-ordered files and replayed with maxFilesPerTrigger=1 (three
  * batches): windowed aggregations and session windows must still equal
  * their batch twins — sessions in particular must merge state across
  * batch boundaries.
  */
class MultiBatchReplaySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val splitDir: String = {
    val dir = Files.createTempDirectory("multibatch").toString
    val ev = Tables.events(spark, sf).orderBy("ts") // ts already TimestampType
    val n = ev.count()
    val rows = ev.collect()
    rows.grouped((n / 3 + 1).toInt).zipWithIndex.foreach { case (chunk, i) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toSeq), ev.schema)
      df.coalesce(1).write.parquet(s"$dir/part$i")
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    dir
  }

  private def source: DataFrame =
    spark.readStream.schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$splitDir/part*")

  private def replay(df: DataFrame, mode: String, name: String): DataFrame = {
    val ckpt = Files.createTempDirectory(s"ckpt-$name").toString
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.mkString("|")).sorted

  test("tumbling agg over 3 micro-batches equals the batch twin") {
    val s = replay(StreamOps.tumblingHour(source), "complete", "mb_tumbling")
    assert(rows(s) == rows(SparkEntry.queries("stream_tumbling_hour")(spark, sf)))
  }

  test("session windows merge across micro-batch boundaries") {
    val s = replay(StreamOps.sessionByUser(source), "complete", "mb_session")
    assert(rows(s) == rows(SparkEntry.queries("stream_session")(spark, sf)))
  }
}
