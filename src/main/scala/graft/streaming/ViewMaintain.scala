package graft.streaming

import graft.operators.ViewOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CONTINUOUS materialized-view maintenance on the real streaming
  * runtime — the production shape of [[graft.operators.ViewOps]]: the
  * changelog arrives as a stream of signed-multiplicity rows, and each
  * micro-batch advances TWO pieces of durable state,
  *
  *   - an append-only DELTA LOG (the lakehouse transaction-log shape:
  *     the base table is never rewritten; its current content is
  *     `old ∪ log` with multiset cancellation — a row is live iff its
  *     signed weights sum to +1),
  *   - the VIEW itself, versioned per batch, maintained by
  *     [[ViewOps.maintainAggView]]: counts/sums delta-merged, min/max
  *     recomputed only for delete-touched groups against the live base
  *     PRUNED to those groups.
  *
  * The final view hash-matches the full-recompute oracle on the new
  * snapshot, certifying that a continuously-maintained view never
  * drifts from what a batch rebuild would produce.
  *
  * @note scale: per micro-batch the work is (a) one delta-sized append,
  *   (b) a view merge sized by touched groups, (c) a live-base
  *   reconstruction pruned by the delete-touched group keys BEFORE the
  *   cancellation group-by — on a partitioned/bucketed lake that prune
  *   is partition elimination, so the batch cost tracks the delta, not
  *   the 100 TB base. The versioned-view write here rewrites the whole
  *   (small) aggregate; a production view partitions on the group key
  *   and rewrites touched partitions only. foreachBatch retries are
  *   idempotent: both the log slice and the view version are keyed by
  *   batchId, so a replayed batch overwrites its own output.
  */
object ViewMaintain {

  /** Replay `deltas` (signed rows, [[ViewOps.rowDeltas]] schema) in
    * `chunks` range-ordered micro-batches over `orderCol`, maintaining
    * the view built from `oldBase` by `groupCols`/`sumCols`/
    * `minMaxCols`; row identity for multiset cancellation is the FULL
    * payload tuple, so `oldBase` rows must be unique. Returns the
    * final maintained view. */
  def maintainViewStream(spark: SparkSession, oldBase: DataFrame,
      deltas: DataFrame, orderCol: String, chunks: Int,
      groupCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("cnt")) ++
      sumCols.map(c => sum(col(c)).as("sum_" + c)) ++
      minMaxCols.flatMap(c => Seq(min(col(c)).as("min_" + c),
        max(col(c)).as("max_" + c)))
    maintainCustomViewStream(spark, oldBase, deltas, orderCol, chunks,
      groupCols,
      buildView = b => b.groupBy(groupCols.map(col): _*)
        .agg(aggs.head, aggs.tail: _*),
      maintain = (prev, batch, live) =>
        ViewOps.maintainAggView(prev, batch, live,
          groupCols, sumCols, minMaxCols))
  }

  /** [[maintainViewStream]] for a per-group TOP-K leaderboard view
    * ([[ViewOps.maintainTopKView]]): same delta-log + versioned-view
    * loop, the per-batch step the k-generalized regime split. */
  def maintainTopKViewStream(spark: SparkSession, oldBase: DataFrame,
      deltas: DataFrame, orderCol: String, chunks: Int,
      groupCols: Seq[String], scoreCol: String, idCol: String,
      k: Int): DataFrame =
    maintainCustomViewStream(spark, oldBase, deltas, orderCol, chunks,
      groupCols,
      buildView = b => ViewOps.topKView(b, groupCols, scoreCol, idCol, k),
      maintain = (prev, batch, live) =>
        ViewOps.maintainTopKView(prev, batch, live,
          groupCols, scoreCol, idCol, k))

  /** The generic core: stage the changelog into `chunks` range-ordered
    * micro-batches, and per batch (a) append the batchId-keyed delta-log
    * slice, (b) rebuild the live base pruned to the delete-touched
    * groups, (c) advance the batchId-versioned view with `maintain`.
    * `buildView` seeds version 0 from the base snapshot. */
  def maintainCustomViewStream(spark: SparkSession, oldBase: DataFrame,
      deltas: DataFrame, orderCol: String, chunks: Int,
      groupCols: Seq[String],
      buildView: DataFrame => DataFrame,
      maintain: (DataFrame, DataFrame, DataFrame) => DataFrame)
      : DataFrame = {
    require(deltas.columns.toSet == oldBase.columns.toSet + "w",
      s"delta schema ${deltas.columns.mkString(",")} must be the base " +
        s"schema ${oldBase.columns.mkString(",")} plus 'w' — a base " +
        "column absent from the changelog would read as NULL in the " +
        "delta log and break full-payload multiset cancellation")
    val root = graft.Scratch.dir("graft-view-maintain")
    val src = Files.createDirectories(root.resolve("src")).toString
    val ckpt = root.resolve("ckpt").toString
    val baseDir = root.resolve("base").toString
    val logDir = root.resolve("log")
    val viewDir = root.resolve("view")
    Files.createDirectories(logDir)
    Files.createDirectories(viewDir)

    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", 2)
    ss.conf.set("spark.sql.streaming.minBatchesToRetain", 1)

    // durable state seeds: the base snapshot + view version 0
    val baseCols = oldBase.columns.toSeq
    oldBase.write.parquet(baseDir)
    buildView(ss.read.parquet(baseDir))
      .write.parquet(viewDir.resolve("v0").toString)

    // stage the changelog into range-ordered chunk files (one pass)
    val b = deltas.agg(min(col(orderCol)).as("lo"),
      max(col(orderCol)).as("hi")).head()
    val (lo, span) =
      (b.getLong(0), math.max(1L, b.getLong(1) - b.getLong(0) + 1L))
    val bucket = least(lit(chunks - 1),
      floor((col(orderCol) - lit(lo)) * lit(chunks.toLong) / lit(span)))
      .cast("int")
    val stage = root.resolve("stage")
    deltas.withColumn("ck", bucket).repartition(col("ck"))
      .write.partitionBy("ck").parquet(stage.toString)
    val deltaSchema = deltas.schema

    val q = ss.readStream.schema(deltaSchema).parquet(src)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sb = batch.sparkSession
        // 1) log slice, keyed by batchId (idempotent on retry)
        batch.coalesce(1).write.mode("overwrite")
          .parquet(logDir.resolve(s"b$batchId").toString)
        // 2) live base pruned to the delete-touched groups before the
        //    cancellation group-by (the partition-elimination analogue)
        val logSlices = {
          val l = Files.list(logDir)
          try {
            val it = l.iterator(); val bufs = Seq.newBuilder[String]
            while (it.hasNext) bufs += it.next().toString
            bufs.result()
          } finally l.close()
        }
        val logged = sb.read.schema(
          sb.read.parquet(baseDir).withColumn("w", lit(1)).schema)
          .parquet(logSlices: _*)
        val negKeys = logged.filter(col("w") < 0)
          .select(groupCols.map(col): _*).distinct()
        val liveBase = sb.read.parquet(baseDir).withColumn("w", lit(1))
          .unionByName(logged)
          .join(negKeys, groupCols, "left_semi")
          .groupBy(baseCols.map(col): _*)
          .agg(sum(col("w")).as("tw")).filter(col("tw") === 1).drop("tw")
        // 3) maintain view v{batchId} -> v{batchId+1}
        val prev = sb.read.parquet(viewDir.resolve(s"v$batchId").toString)
        maintain(prev, batch, liveBase)
          .write.mode("overwrite")
          .parquet(viewDir.resolve(s"v${batchId + 1}").toString)
        ()
      }
      .option("checkpointLocation", ckpt).start()
    var last = 0L
    try {
      (0 until chunks).foreach { i =>
        val dir = stage.resolve(s"ck=$i")
        if (Files.isDirectory(dir)) {
          val listing = Files.list(dir)
          try {
            val files = listing.iterator()
            var j = 0
            while (files.hasNext) {
              val f = files.next()
              if (f.getFileName.toString.endsWith(".parquet")) {
                Files.move(f,
                  java.nio.file.Paths.get(src, s"chunk_${i}_$j.parquet"))
                j += 1
              }
            }
          } finally listing.close()
          q.processAllAvailable()
        }
      }
    } finally q.stop()
    // latest view version
    val vs = Files.list(viewDir)
    val maxV =
      try {
        val it = vs.iterator(); var m = 0L
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.startsWith("v")) m = math.max(m, n.drop(1).toLong)
        }
        m
      } finally vs.close()
    last = maxV
    spark.read.parquet(viewDir.resolve(s"v$last").toString)
  }
}
