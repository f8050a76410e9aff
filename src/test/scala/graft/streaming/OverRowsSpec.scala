package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Streaming OVER aggregation ([[StreamOps.overRows]]): the replayed
  * watermark-gated path ∪ checkpoint drain must equal the batch
  * window-function twin row-for-row — including the frame warm-up
  * (n_frame < nPrec+1 for each key's first rows) and (ts, event_id)
  * tie-breaking. The sf0.01 oracle key (`stream_over_replay`) covers
  * the hash gate; this spec keeps the sf0.001 fast loop and checks the
  * flush actually contributes rows (the above-final-watermark tail is
  * non-empty by construction with a 30-minute delay).
  */
class OverRowsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("replayed streaming OVER ∪ flush equals the batch window twin") {
    val out = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.overRows(ev))(ckpt =>
      StateFlush.overRows(spark, ckpt))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    val batch = Tables.events(spark, sf).select(
      col("user_id"), col("event_id"),
      count(lit(1)).over(w).cast("int").as("n_frame"),
      sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
        .as("over_sum"))

    def key(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("user_id", "event_id", "n_frame", "over_sum")
        .collect().toSeq.map(_.toSeq.mkString("|")).sorted

    val streamed = key(out)
    assert(streamed == key(batch))
    assert(streamed.size == Tables.events(spark, sf).count())
  }

  test("every key's event-time-first row has a single-row frame") {
    val out = BoundedReplay.replayEvents(spark, sf)(ev =>
      StreamOps.overRows(ev))(ckpt => StateFlush.overRows(spark, ckpt))
    val firsts = out
      .join(Tables.events(spark, sf).select("event_id", "ts"), "event_id")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")))
      .filter(col("rn") === 1)
    assert(firsts.count() > 0)
    assert(firsts.filter(col("n_frame") =!= 1).count() == 0)
  }
}
