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

  test("foreachBatch incremental MERGE (applyChangelog) converges to the batch upsert") {
    import org.apache.spark.sql.expressions.Window
    // the T10 sink face: each micro-batch is compacted to its latest row
    // per user and MERGEd into a driver-held state table — update when
    // strictly newer by (ts, event_id), insert when absent. After full
    // replay the state must equal the batch cdc_upsert_latest key.
    val sel = (df: DataFrame) => df.select(col("user_id"),
      col("event_id").as("last_event_id"), col("event_type").as("last_type"),
      col("value").as("last_value"), unix_micros(col("ts")).as("last_ts_us"))
    var state = sel(Tables.events(spark, sf)).limit(0)
    val schema = state.schema
    val ckpt = Files.createTempDirectory("ckpt-merge").toString
    val q = source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = Window.partitionBy("user_id")
          .orderBy(col("last_ts_us").desc, col("last_event_id").desc)
        val latest = sel(batch).withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        val existing = state.select(col("user_id"),
          col("last_ts_us").as("s_ts"), col("last_event_id").as("s_eid"))
        val winners = latest.join(existing, Seq("user_id"), "left")
          .filter(col("s_ts").isNull || col("last_ts_us") > col("s_ts") ||
            (col("last_ts_us") === col("s_ts") && col("last_event_id") > col("s_eid")))
          .drop("s_ts", "s_eid")
          .withColumn("change", lit("update"))
        val merged = graft.operators.DiffOps.applyChangelog(
          state, winners, Seq("user_id"))
        // materialize: a foreachBatch DataFrame is only valid within its
        // batch, so the carried state must not retain its lineage
        state = spark.createDataFrame(
          spark.sparkContext.parallelize(merged.collect().toSeq), schema)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(rows(state) ==
      rows(SparkEntry.queries("cdc_upsert_latest")(spark, sf)))
  }
}
