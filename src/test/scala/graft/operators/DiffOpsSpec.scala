package graft.operators

import graft.SparkSpec

/** Snapshot-diff classification incl. the NULL-value edge cases the
  * presence markers exist for. */
class DiffOpsSpec extends SparkSpec {

  test("snapshotDiff classifies insert/delete/update and drops unchanged") {
    import spark.implicits._
    val oldS = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(30.0)),
      (4L, None: Option[Double])).toDF("k", "v")
    val newS = Seq((2L, Some(21.0)), (3L, Some(30.0)), (4L, None: Option[Double]),
      (5L, Some(50.0))).toDF("k", "v")
    val got = DiffOps.snapshotDiff(oldS, newS, Seq("k"), Seq("v"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    // 1: gone → delete; 2: value changed → update; 3: same → dropped;
    // 4: NULL == NULL → same (null-safe), dropped; 5: new → insert
    assert(got == Seq((1L, "delete"), (2L, "update"), (5L, "insert")))
  }

  test("snapshotDiff: NULL-to-value and value-to-NULL are updates") {
    import spark.implicits._
    val oldS = Seq((1L, None: Option[Double]), (2L, Some(2.0))).toDF("k", "v")
    val newS = Seq((1L, Some(1.0)), (2L, None: Option[Double])).toDF("k", "v")
    val got = DiffOps.snapshotDiff(oldS, newS, Seq("k"), Seq("v"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "update"), (2L, "update")))
  }

  test("mergeNewer: updates only strictly-newer, inserts absent, replay cannot regress") {
    import spark.implicits._
    val base = Seq((1L, 10L, "old"), (2L, 20L, "keep"), (3L, 30L, "tie"))
      .toDF("k", "ver", "v")
    val incoming = Seq((1L, 11L, "newer"), (3L, 30L, "tie-incoming"),
      (4L, 5L, "insert")).toDF("k", "ver", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").as[(Long, Long, String)].collect().toSeq
    val merged = DiffOps.mergeNewer(base, incoming, Seq("k"), Seq("ver"))
    // 1 updated (11 > 10), 2 untouched, 3 kept (tie is NOT newer), 4 inserted
    assert(rows(merged) == Seq((1L, 11L, "newer"), (2L, 20L, "keep"),
      (3L, 30L, "tie"), (4L, 5L, "insert")))
    // idempotent: applying the same batch again changes nothing
    assert(rows(DiffOps.mergeNewer(merged, incoming, Seq("k"), Seq("ver")))
      == rows(merged))
    // replaying an OLDER batch cannot regress the table
    val older = Seq((1L, 2L, "stale"), (4L, 1L, "stale")).toDF("k", "ver", "v")
    assert(rows(DiffOps.mergeNewer(merged, older, Seq("k"), Seq("ver")))
      == rows(merged))
  }

  test("applyChangelog inverts snapshotDiff: apply(old, diff+payload) == new") {
    import spark.implicits._
    // pseudo-random keyed frames with nulls, overlapping and disjoint keys
    def frame(seed: Long) = (0L until 200L)
      .filter(k => (k * 2654435761L + seed) % 3 != 0)
      .map { k =>
        val h = (k * 40503L + seed) % 97
        (k, if (h % 11 == 0) None else Some(h.toDouble))
      }.toDF("k", "v")
    val oldS = frame(1)
    val newS = frame(2)
    val changes = DiffOps.snapshotDiff(oldS, newS, Seq("k"), Seq("v"))
      .join(newS, Seq("k"), "left")
    val applied = DiffOps.applyChangelog(oldS, changes, Seq("k"))
      .orderBy("k").as[(Long, Option[Double])].collect().toSeq
    val want = newS.orderBy("k").as[(Long, Option[Double])].collect().toSeq
    assert(applied == want)
  }
}
