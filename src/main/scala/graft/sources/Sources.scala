package graft.sources

import graft.Tables
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Source/sink surface (SURVEY.md §2.1).
  *
  * | # | capability | here |
  * |---|---|---|
  * | S1 | parquet batch scan        | [[graft.Tables]] (explicit-schema readers) |
  * | S2 | bounded stream replay     | [[eventsReplay]] / [[StreamOps.source]] |
  * | S3 | Kafka source              | [[kafkaJson]] — API parity only: this
  *       zero-egress image ships no broker and no spark-sql-kafka
  *       connector jar, so the format is unresolvable here; the method
  *       documents the exact production wiring |
  * | S4 | rate/datagen source       | [[rate]] (smoke-tested) |
  * | S5 | file/parquet sink         | [[parquetSink]] (used by Verify + recovery spec) |
  * | S6 | console sink              | [[consoleSink]] |
  * | S7 | JDBC upsert sink          | [[jdbcUpsertSink]] / [[jdbcUpsert]] —
  *       end-to-end against embedded Derby (`JdbcUpsertSpec`) |
  *
  * @note scale: all streaming reads are incremental-file-listing or
  *   offset-based; none list the full lake per trigger. Replay uses
  *   `maxFilesPerTrigger` to bound per-batch state growth.
  */
object Sources {

  /** S2: bounded replay of the driver's events table as a stream. */
  def eventsReplay(spark: SparkSession, sfDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    StreamOps.source(spark, sfDir, maxFilesPerTrigger)

  /** S4: rate source — monotonically increasing (timestamp, value) rows. */
  def rate(spark: SparkSession, rowsPerSecond: Int = 100): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** S3: Kafka JSON-value topic → typed columns. Requires the
    * spark-sql-kafka-0-10 connector on the classpath and a reachable
    * broker — neither exists in this environment, so calling this here
    * fails at format resolution; the wiring is the production-exact
    * shape (earliest offsets, value parsed with an explicit schema —
    * never schema inference on a stream). `KafkaContractSpec` pins the
    * contract that IS checkable without infra: the options build and
    * the plan reaches provider lookup (failing with the classified
    * missing-provider error, not an option/wiring error), and both
    * transform halves below round-trip. */
  def kafkaJson(spark: SparkSession, bootstrapServers: String, topic: String,
      schema: StructType): DataFrame =
    kafkaValueParse(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load(),
      schema)

  /** S3 consumer transform half: Kafka wire rows (`value` binary, plus
    * key/topic/partition/offset/timestamp) → typed columns via an
    * explicit schema. Broker-independent, so it is testable here on a
    * wire-shaped frame and identical in production after `load()`. */
  def kafkaValueParse(wire: DataFrame, schema: StructType): DataFrame =
    wire.select(from_json(col("value").cast("string"), schema).as("r"))
      .select("r.*")

  /** S3 producer transform half: typed rows → the `(key, value)` binary
    * pair the Kafka SINK contract requires (key for partitioning,
    * JSON-encoded payload struct as value). Compose with
    * `writeStream.format("kafka")` in production. */
  def toKafkaWire(df: DataFrame, keyCol: String, payloadCols: Seq[String]): DataFrame =
    df.select(col(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(payloadCols.map(col): _*)).cast("binary").as("value"))

  /** S5: exactly-once parquet sink (commit log in the checkpoint). */
  def parquetSink(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)

  /** S6: console sink for ad-hoc inspection. */
  def consoleSink(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("console").option("truncate", "false")

  /** S7 batch half: keyed UPSERT of `df` into a JDBC table. Runs on the
    * executors (`foreachPartition`), one transaction per partition, as
    * the portable two-statement form — UPDATE by key, INSERT when no
    * row matched — batched through prepared statements, so it works on
    * any JDBC database (exercised end-to-end against embedded Derby in
    * `JdbcUpsertSpec`; the same code reaches Postgres/MySQL by URL).
    * Idempotent by construction: re-applying a batch converges to the
    * same table state, which is exactly what streaming replay needs.
    * Duplicate keys inside one call are safe too: the partition tracks
    * which keys sit in the not-yet-flushed INSERT batch and flushes
    * before probing such a key again, so the second row's UPDATE sees
    * the first row instead of double-inserting (last row in partition
    * order wins — [[jdbcUpsertSink]] additionally compacts per key so
    * "last" is deterministic under shuffle).
    *
    * @note scale: no driver involvement beyond the plan — each
    *   partition holds one connection and flushes in `batchSize`
    *   chunks (the duplicate-key flush costs extra round-trips only
    *   when a partition actually repeats a key); repartition by key
    *   upstream if the target enforces row-level locking and
    *   partitions contend. */
  def jdbcUpsert(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], batchSize: Int = 500): Unit = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    require(keyCols.forall(cols.contains), s"keys $keyCols must be in $cols")
    val valCols = cols.filterNot(keyCols.contains)
    require(valCols.nonEmpty, "upsert needs at least one non-key column")
    val updateSql = s"UPDATE $table SET ${valCols.map(c => s"$c = ?").mkString(", ")} " +
      s"WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val idx = cols.zipWithIndex.toMap
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          var pending = 0
          // keys whose INSERT is still unflushed: a repeat of one of
          // these would miss its UPDATE probe and double-insert
          val pendingKeys = scala.collection.mutable.HashSet.empty[Seq[Any]]
          def flush(): Unit = {
            if (pending > 0) ins.executeBatch()
            pending = 0; pendingKeys.clear()
          }
          rows.foreach { r =>
            val key = keyCols.map(c => r.get(idx(c)))
            if (pendingKeys.contains(key)) flush()
            valCols.zipWithIndex.foreach { case (c, i) =>
              upd.setObject(i + 1, r.get(idx(c))) }
            keyCols.zipWithIndex.foreach { case (c, i) =>
              upd.setObject(valCols.size + i + 1, r.get(idx(c))) }
            if (upd.executeUpdate() == 0) {
              cols.zipWithIndex.foreach { case (c, i) =>
                ins.setObject(i + 1, r.get(idx(c))) }
              ins.addBatch()
              pending += 1
              pendingKeys += key
              if (pending >= batchSize) flush()
            }
          }
          flush()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** S7 streaming half: continuous keyed upsert — each micro-batch is
    * first compacted to its latest row per key (greatest `orderCol`,
    * deterministic), then [[jdbcUpsert]]ed, so the table converges to
    * last-write-wins state and a replayed batch is a no-op. */
  def jdbcUpsertSink(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], orderCol: String): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(col(orderCol).desc)
      val latest = batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      jdbcUpsert(latest, url, table, keyCols)
      ()
    }
}
