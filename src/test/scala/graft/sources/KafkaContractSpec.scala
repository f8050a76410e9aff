package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** S3 contract, everything checkable without a broker (SURVEY §2.1):
  * the source/sink wiring must build its options and reach PROVIDER
  * LOOKUP — i.e. fail with the classified missing-data-source error,
  * never an option-validation or analysis error — and the two
  * broker-independent transform halves must round-trip a payload
  * through the exact Kafka wire shape (binary key/value plus
  * topic/partition/offset/timestamp metadata columns).
  *
  * If this environment ever gains the spark-sql-kafka connector, the
  * two lookup tests start failing — deliberately: that is the signal
  * to replace them with an embedded-broker end-to-end test.
  */
class KafkaContractSpec extends SparkSpec {

  private def lookupError(body: => Any): String = {
    val e = intercept[Exception](body)
    val msg = (e.getMessage + " " + e.getClass.getName).toLowerCase
    assert(msg.contains("kafka"), s"error must name the kafka provider: $e")
    assert(msg.contains("data source") || msg.contains("datasource") ||
      msg.contains("failed to find") || msg.contains("classnotfound"),
      s"must fail at provider lookup, not before: $e")
    e.getMessage
  }

  test("source plan builds options and fails only at provider lookup") {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    lookupError {
      Sources.kafkaJson(spark, "broker-a:9092,broker-b:9092", "events", schema)
    }
  }

  test("sink plan builds options and fails only at provider lookup") {
    val wire = Sources.toKafkaWire(
      Sources.rate(spark).withColumn("payload", col("value").cast("string")),
      "value", Seq("payload"))
    lookupError {
      wire.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", "broker-a:9092")
        .option("topic", "out")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt-kafka").toString)
        .start()
    }
  }

  test("producer/consumer transform halves round-trip the wire shape") {
    val sp = spark
    import sp.implicits._
    val rows = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, "gamma", 0.0))
    val df = rows.toDF("id", "name", "score")

    // producer half: the sink contract wants binary key/value
    val wire = Sources.toKafkaWire(df, "id", Seq("id", "name", "score"))
    assert(wire.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("key", BinaryType), ("value", BinaryType)))

    // wrap in the FULL source wire schema a real consumer would see
    val full = wire.select(col("key"), col("value"),
      lit("events").as("topic"), lit(0).as("partition"),
      monotonically_increasing_id().as("offset"),
      lit(Timestamp.valueOf("2024-01-01 00:00:00")).as("timestamp"),
      lit(0).as("timestampType"))

    // consumer half: explicit schema, typed columns back
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val back = Sources.kafkaValueParse(full, schema)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back == rows.toSet)
  }
}
