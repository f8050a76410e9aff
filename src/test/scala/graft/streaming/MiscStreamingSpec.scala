package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import java.nio.file.Files

/** Remaining streaming surfaces:
  *  - U1 on streams: union of two streaming DataFrames;
  *  - S3's transform half: the Kafka value-parse wiring (JSON string →
  *    typed columns with an explicit schema) driven by a file stream
  *    standing in for the unreachable broker;
  *  - O4: continuous Top-N maintained per micro-batch via foreachBatch
  *    (the retract-sink workaround — file sinks are append-only).
  */
class MiscStreamingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def replay(df: DataFrame, mode: String, name: String): DataFrame = {
    val ckpt = Files.createTempDirectory(s"ckpt-$name").toString
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("deterministic hash sampling on a stream equals the batch sample") {
    import graft.operators.SampleOps
    val streamed = replay(
      SampleOps.hashSample(StreamOps.source(spark, sf), rate = 0.3, idCol = "event_id")
        .select("event_id"), "append", "t_sample_stream")
      .collect().map(_.getLong(0)).toSet
    val batch = SampleOps.hashSample(graft.Tables.events(spark, sf),
        rate = 0.3, idCol = "event_id")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch, "membership is a pure function of the id, so " +
      "streaming and batch must select the identical sample")
    assert(batch.nonEmpty)
  }

  test("U1-stream: union of two filtered streams equals one filtered stream") {
    val src = StreamOps.source(spark, sf)
    val u = src.filter(col("event_type") === "click")
      .unionByName(src.filter(col("event_type") === "error"))
      .select("event_id")
    val got = replay(u, "append", "t_union")
    val expected = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "error")).count()
    assert(got.count() == expected)
    assert(got.distinct().count() == got.count())
  }

  test("S3 transform path: JSON value parsing with explicit schema") {
    // events.props is a JSON string — exactly a Kafka value column's shape
    val schema = StructType(Seq(StructField("k", IntegerType)))
    val parsed = StreamOps.source(spark, sf)
      .select(col("event_id"), from_json(col("props"), schema).as("r"))
      .select(col("event_id"), col("r.k").as("k"))
    val got = replay(parsed, "append", "t_kafka_shape")
    assert(got.count() == 1000)
    assert(got.filter(col("k").isNull).count() == 0, "every props row parses")
  }

  test("count-window streaming twin emits exactly the batch twin's full buckets") {
    val got = replay(
        StreamOps.countWindows(StreamOps.source(spark, sf), n = 10).toDF(),
        "append", "t_cntwin")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val batch = graft.SparkEntry.queries("window_count_based")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // streaming emits a bucket only when it FILLS; the batch twin also
    // carries each user's partial tail bucket (the flush face drains
    // it — stream_countwin_replay gates streamed ∪ flush == batch)
    val expected = batch.filter(_._3 == 10L)
    assert(got.map(t => (t._1, t._2, t._3.toLong)).toSet ==
      expected.map(t => (t._1, t._2, t._3)).toSet)
    // sums ride the exact micro-unit grid — bit-equal to Det.dsum
    val gotSums = got.map(t => (t._1, t._2) -> t._4).toMap
    expected.foreach { case (u, b, _, s) =>
      assert(gotSums((u, b)) == s, s"user=$u bucket=$b must be bit-exact")
    }
  }

  test("O4: continuous Top-N via foreachBatch converges to the batch Top-N") {
    val ckpt = Files.createTempDirectory("ckpt-topn").toString
    val (tracker, writer) = StreamOps.topNContinuous(
      StreamOps.source(spark, sf, maxFilesPerTrigger = Some(1)),
      k = 10, valueCol = "value", idCol = "event_id")
    val q = writer.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val expected = graft.Tables.events(spark, sf)
      .orderBy(col("value").desc, col("event_id")).limit(10)
      .collect().map(r => (r.getAs[Double]("value"), r.getAs[Long]("event_id"))).toSet
    assert(tracker.current.toSet == expected)
    assert(tracker.current.head._1 == tracker.current.map(_._1).max, "best first")
  }
}
