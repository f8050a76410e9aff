package graft.plans

import graft.SparkSpec
import java.sql.Timestamp

/** Edge cases for the native as-of join that the fixture data doesn't
  * force: unmatched probe keys (left-outer nulls), exact-time matches
  * (inclusive bound), ties on build time (max tie wins), empty build
  * side partitions.
  */
class AsOfJoinSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("as-of join edge cases: nulls, inclusive bound, tie-break") {
    val sp = spark
    import sp.implicits._
    val probe = Seq(
      (1L, t("10:00:00"), 100L), // matched by b at 09:30
      (1L, t("11:00:00"), 101L), // matched by the tie pair at 11:00 (inclusive, max tie)
      (2L, t("10:00:00"), 200L), // key with no build rows at all -> null
      (3L, t("08:00:00"), 300L)  // build rows exist but all LATER -> null
    ).toDF("k", "pts", "pid")
    val build = Seq(
      (1L, t("09:30:00"), 11L),
      (1L, t("11:00:00"), 12L), // tie on time with 13
      (1L, t("11:00:00"), 13L), // max tie wins for probe 101
      (3L, t("09:00:00"), 31L)  // after probe 300's time
    ).toDF("bk", "bts", "bid")

    val got = AsOfJoinOps.asofJoin(probe, build,
        probe("k"), build("bk"), probe("pts"), build("bts"), build("bid"))
      .select("pid", "bid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(got == Map(100L -> 11L, 101L -> 13L, 200L -> -1L, 300L -> -1L), got.toString)
  }

  test("as-of join rejects non-64-bit key/time columns up front") {
    val sp = spark
    import sp.implicits._
    val probe = Seq((1, t("10:00:00"), 100L)).toDF("k", "pts", "pid") // k: Int
    val build = Seq((1, t("09:30:00"), 11L)).toDF("bk", "bts", "bid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinOps.asofJoin(probe, build,
        probe("k"), build("bk"), probe("pts"), build("bts"), build("bid"))
    }
    assert(e.getMessage.contains("64-bit"), e.getMessage)
  }
}
