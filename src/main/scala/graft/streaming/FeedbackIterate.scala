package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import java.nio.file.Files

/** One label-propagation message: `lbl` proposed to `node` for
  * synchronous round `round`. */
case class LblMsg(node: String, lbl: String, round: Int)
case class LblState(lbl: String)

/** STREAMING CYCLIC ITERATION — the Flink `DataStream#iterate`
  * pattern, previously documented here as an engine ceiling
  * ("Structured Streaming has no iteration edge"). It does not need
  * one: a file-source query whose `foreachBatch` sink writes its own
  * emissions BACK INTO the source directory IS a cyclic dataflow, and
  * the micro-batch boundary is exactly the synchronous-superstep
  * barrier BSP iteration wants — batch k processes precisely the
  * messages batch k−1 emitted, so each micro-batch is one Pregel
  * round. Bounded rounds terminate the cycle the same way Flink
  * bounds `iterate` with a max-waiting-time / termination criterion.
  *
  * Instantiated here as synchronous label propagation, message-passing
  * form: state per node is its current label; round-k messages carry
  * each neighbor's round-(k−1) label; the update is top-1 by
  * `(count DESC, label ASC)` — token for token the batch
  * [[graft.operators.GraphOps.labelPropagation]] update, so a
  * complete run equals the batch operator EXACTLY and
  * `stream_iterate_lpa` sits under `graph_label_prop`'s own unrolled
  * oracle. The general pattern (any keyed state + any message fan-out)
  * follows by swapping the two lambdas.
  *
  * @note scale: per round the work is one exchange of |E| messages to
  *   the node key — the identical cost shape as the batch round's
  *   shuffle join, paid through the state store instead. The
  *   adjacency is broadcast (loud cap): the streaming-iterate form is
  *   for metadata-sized graphs embedded in pipelines (session graphs,
  *   vocabulary graphs, rule dependency nets); web-scale hyperlink
  *   graphs run the batch [[graft.operators.GraphOps.iterate]] whose
  *   adjacency is a distributed join, not a broadcast. */
object FeedbackIterate {

  def labelPropagation(spark: SparkSession, edges: DataFrame,
      iters: Int = 3, srcCol: String = "src", dstCol: String = "dst",
      maxAdjacencyEdges: Long = 50000000L): DataFrame = {
    require(iters >= 1, "need at least one round")
    // canonical undirected symmetric adjacency — the batch form's own
    val und = edges.filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val sym = und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
    val symRows = sym.collect()
    require(symRows.length <= maxAdjacencyEdges,
      s"adjacency has ${symRows.length} directed edges (> $maxAdjacencyEdges) " +
        "— the feedback-iterate form broadcasts it; run the batch " +
        "GraphOps.labelPropagation (distributed join per round) instead")
    val adj: Map[String, Array[String]] = symRows
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).sorted }
    val bc = spark.sparkContext.broadcast(adj)

    val root = graft.Scratch.dir("graft-iterate")
    val src = Files.createDirectories(root.resolve("src")).toString
    val ckpt = root.resolve("ckpt").toString
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", 2)
    ss.conf.set("spark.sql.streaming.minBatchesToRetain", 1)
    import ss.implicits._

    // seed = round-1 messages: every node's identity label (l0) to
    // each of its neighbors — one file, so batch 0 is round 1 entire
    val seed = adj.toSeq.sortBy(_._1).flatMap { case (v, nbrs) =>
      nbrs.map(u => LblMsg(u, v, 1))
    }
    ss.createDataset(seed).toDF("node", "lbl", "round")
      .coalesce(1).write.mode("append").parquet(src)

    val stream = ss.readStream
      .schema("node STRING, lbl STRING, round INT").parquet(src)
      .as[LblMsg]
      .groupByKey(_.node)
      .flatMapGroupsWithState[LblState, LblMsg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (node, it, state) =>
        val msgs = it.toSeq
        val round = msgs.head.round // one round per micro-batch
        // top-1 by (count DESC, label ASC) — the batch update rule
        val top = msgs.groupBy(_.lbl).view.mapValues(_.size).toSeq
          .sortBy { case (l, c) => (-c, l) }.head._1
        state.update(LblState(top))
        if (round < iters)
          bc.value(node).iterator.map(nbr => LblMsg(nbr, top, round + 1))
        else Iterator.empty
      }

    // the ITERATION EDGE: emissions land back in the source directory
    val q = stream.toDF().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val next = batch.coalesce(1)
        if (!next.isEmpty) next.write.mode("append").parquet(src)
        ()
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try (0 to iters).foreach(_ => q.processAllAvailable())
    finally q.stop()

    // final labels = the stopped query's state, one row per node
    spark.read.format("statestore").option("path", ckpt).load()
      .select(col("key.value").as("node"),
        col("value.groupState.lbl").as("lbl"))
  }
}
