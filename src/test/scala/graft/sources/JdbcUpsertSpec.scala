package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.DriverManager

case class UpsertRow(k: Long, ts: Long, v: String)

/** S7 end-to-end: the keyed JDBC upsert sink against an EMBEDDED Derby
  * database (in this JVM — the same code reaches any JDBC URL). Pins
  * last-write-wins convergence across micro-batches, within-batch
  * compaction, and replay idempotence. */
class JdbcUpsertSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:upsertdb;create=true"

  private def freshTable(name: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(s"DROP TABLE $name") catch { case _: Exception => () }
      st.execute(s"CREATE TABLE $name (k BIGINT PRIMARY KEY, ts BIGINT, v VARCHAR(64))")
    } finally conn.close()
  }

  private def tableRows(name: String): Set[(Long, Long, String)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT k, ts, v FROM $name")
      val buf = scala.collection.mutable.Set.empty[(Long, Long, String)]
      while (rs.next()) buf += ((rs.getLong(1), rs.getLong(2), rs.getString(3)))
      buf.toSet
    } finally conn.close()
  }

  test("batch jdbcUpsert inserts then updates by key, idempotently") {
    freshTable("t_batch")
    val sp = spark
    import sp.implicits._
    val first = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "ts", "v")
    Sources.jdbcUpsert(first, url, "t_batch", Seq("k"))
    assert(tableRows("t_batch") == Set((1L, 10L, "a"), (2L, 10L, "b")))

    val second = Seq((2L, 20L, "b2"), (3L, 20L, "c")).toDF("k", "ts", "v")
    Sources.jdbcUpsert(second, url, "t_batch", Seq("k"))
    assert(tableRows("t_batch") ==
      Set((1L, 10L, "a"), (2L, 20L, "b2"), (3L, 20L, "c")))

    // replaying the same frame is a no-op (idempotence = replay safety)
    Sources.jdbcUpsert(second, url, "t_batch", Seq("k"))
    assert(tableRows("t_batch") ==
      Set((1L, 10L, "a"), (2L, 20L, "b2"), (3L, 20L, "c")))
  }

  test("duplicate keys inside one partition collapse to the last row, no double insert") {
    freshTable("t_dup")
    val sp = spark
    import sp.implicits._
    // single partition so both duplicates share one INSERT batch — the
    // shape that used to double-insert (PK violation) before the
    // pending-key flush: row 1's INSERT was still unflushed when row 2's
    // UPDATE probed, so both rows took the INSERT path
    val df = Seq((1L, 10L, "a1"), (2L, 10L, "b"), (1L, 20L, "a2"))
      .toDF("k", "ts", "v").coalesce(1)
    Sources.jdbcUpsert(df, url, "t_dup", Seq("k"))
    assert(tableRows("t_dup") == Set((1L, 20L, "a2"), (2L, 10L, "b")))
    // and a key straddling a flush boundary (batchSize 2) still converges
    freshTable("t_dup2")
    val df2 = Seq((1L, 1L, "p"), (2L, 1L, "q"), (1L, 2L, "p2"), (3L, 1L, "r"))
      .toDF("k", "ts", "v").coalesce(1)
    Sources.jdbcUpsert(df2, url, "t_dup2", Seq("k"), batchSize = 2)
    assert(tableRows("t_dup2") ==
      Set((1L, 2L, "p2"), (2L, 1L, "q"), (3L, 1L, "r")))
  }

  test("streaming sink converges to last-write-wins across micro-batches") {
    freshTable("t_stream")
    val sp = spark
    import sp.implicits._
    implicit val ctx = sp.sqlContext
    val input = MemoryStream[UpsertRow]
    val q = Sources.jdbcUpsertSink(input.toDF(), url, "t_stream",
        keyCols = Seq("k"), orderCol = "ts")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-jdbc").toString)
      .trigger(Trigger.AvailableNow())

    // batch 1: duplicate key WITHIN the batch — compaction must pick ts=12
    input.addData(UpsertRow(1L, 11L, "x1"), UpsertRow(1L, 12L, "x2"),
      UpsertRow(2L, 11L, "y1"))
    val q1 = q.start(); q1.awaitTermination()
    assert(tableRows("t_stream") == Set((1L, 12L, "x2"), (2L, 11L, "y1")))

    // batch 2: update one key, insert another
    input.addData(UpsertRow(2L, 20L, "y2"), UpsertRow(3L, 20L, "z1"))
    val q2 = q.start(); q2.awaitTermination()
    assert(tableRows("t_stream") ==
      Set((1L, 12L, "x2"), (2L, 20L, "y2"), (3L, 20L, "z1")))
  }
}
