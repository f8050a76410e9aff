package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig}
import java.nio.file.Files

/** SURVEY §2.9 T12 extension — the production migration story for
  * long-lived streaming jobs: EVOLVE the state class (add a field with
  * a default) between a stop and a restart from the SAME checkpoint.
  * Spark 4's transformWithState supports this under the Avro state
  * encoding (`spark.sql.streaming.stateStore.encodingFormat=avro`,
  * RocksDB provider): v1 rows deserialize into the v2 class with the
  * added field defaulted, so recovered counters keep counting.
  */
object StateEvolutionSpec {
  case class EvoV1(cnt: Long)
  case class EvoV2(cnt: Long, sum: Option[Double]) // added field, defaults null

  /** v1: per-key event counter. */
  class CounterV1 extends StatefulProcessor[Long, (Long, Double), (Long, Long)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[EvoV1] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[EvoV1]("evo", Encoders.product[EvoV1], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long)] = {
      val cnt = (if (st.exists()) st.get().cnt else 0L) + rows.size
      st.update(EvoV1(cnt))
      Iterator.single((key, cnt))
    }
  }

  /** v2: same named state, class gains a running sum. */
  class CounterV2 extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[EvoV2] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[EvoV2]("evo", Encoders.product[EvoV2], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val prev = if (st.exists()) st.get() else EvoV2(0L, None)
      var cnt = prev.cnt
      var sum = prev.sum.getOrElse(0.0)
      rows.foreach { r => cnt += 1; sum += r._2 }
      st.update(EvoV2(cnt, Some(sum)))
      Iterator.single((key, cnt, sum))
    }
  }
}

class StateEvolutionSpec extends SparkSpec {
  import StateEvolutionSpec._

  test("state class evolves (adds a field) across restart from checkpoint") {
    val sp = spark
    import sp.implicits._
    val inDir = Files.createTempDirectory("evo-in").toString
    val ckpt = Files.createTempDirectory("evo-ckpt").toString

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val encKey = "spark.sql.streaming.stateStore.encodingFormat"
    val prevProv = spark.conf.getOption(provKey)
    val prevEnc = spark.conf.getOption(encKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(encKey, "avro")
    try {
      Seq((1L, 10.0), (1L, 5.0), (2L, 7.0)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(inDir)

      def src = spark.readStream.schema("k LONG, v DOUBLE").parquet(inDir)
        .as[(Long, Double)].groupByKey(_._1)

      // run 1: v1 state (cnt only). foreachBatch sink — the memory
      // sink refuses checkpoint recovery, this one restarts cleanly.
      val b1 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q1 = src.transformWithState(new CounterV1,
          TimeMode.None(), OutputMode.Update())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[(Long, Long)], _: Long) =>
          b1.synchronized { b1 ++= ds.collect() }; ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q1.awaitTermination()
      assert(b1.toMap == Map(1L -> 2L, 2L -> 1L))

      // stop; EVOLVE the state class; restart from the same checkpoint
      Seq((1L, 1.0), (3L, 2.0)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(inDir)
      val b2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val q2 = src.transformWithState(new CounterV2,
          TimeMode.None(), OutputMode.Update())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[(Long, Long, Double)], _: Long) =>
          b2.synchronized { b2 ++= ds.collect() }; ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      val r2 = b2.map { case (k, c, s2) => k -> ((c, s2)) }.toMap

      // recovered v1 counters kept counting; the added field defaulted
      // (sum covers only post-evolution events)
      assert(r2 == Map(1L -> ((3L, 1.0)), 3L -> ((1L, 2.0))),
        s"got $r2")
    } finally {
      prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
      prevEnc.fold(spark.conf.unset(encKey))(spark.conf.set(encKey, _))
    }
  }
}
