package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Flink `BroadcastProcessFunction` parity ([[StreamOps.dynamicRules]]):
  * the rule set is re-resolved at every micro-batch boundary, so a rule
  * change between triggers affects the very next batch — no restart, no
  * recompiled query.
  */
class DynamicRulesSpec extends SparkSpec {

  test("rule change between micro-batches routes the next batch differently") {
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[(String, Double)]

    // mutable control table: (event_type -> action), swapped mid-stream
    @volatile var rules: Seq[(String, String)] =
      Seq("click" -> "keep", "error" -> "alert")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]

    val q = StreamOps.dynamicRules(
        input.toDF().toDF("event_type", "v"),
        s => { import s.implicits._; rules.toDF("event_type", "action") }) {
        (batch, ruleTab) =>
          batch.join(ruleTab, Seq("event_type"), "left")
            .select(col("event_type"),
              coalesce(col("action"), lit("drop")).as("action"))
      } { (out, batchId) =>
        got ++= out.collect().map(r => (batchId, r.getString(0), r.getString(1)))
      }
      .option("checkpointLocation", Files.createTempDirectory("ckpt-rules").toString)
      .start()

    try {
      input.addData("click" -> 1.0, "error" -> 2.0, "view" -> 3.0)
      q.processAllAvailable()
      // swap the rule set: errors now suppressed, views kept
      rules = Seq("click" -> "keep", "view" -> "keep")
      input.addData("click" -> 4.0, "error" -> 5.0, "view" -> 6.0)
      q.processAllAvailable()
    } finally q.stop()

    val byBatch = got.groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).sortBy(_._1)).toMap
    assert(byBatch(0L) == Seq("click" -> "keep", "error" -> "alert", "view" -> "drop"),
      s"batch 0 must see the initial rules, got ${byBatch.get(0L)}")
    assert(byBatch(1L) == Seq("click" -> "keep", "error" -> "drop", "view" -> "keep"),
      s"batch 1 must see the swapped rules, got ${byBatch.get(1L)}")
  }
}
