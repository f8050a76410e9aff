package graft.operators

import graft.SparkSpec
import graft.functions.EditDistance
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the native strip+band `lev_within` kernel equal to the builtin
  * thresholded levenshtein: exhaustive short-string pairs, seeded random
  * long pairs (near-copies and unrelated), and the SQL-registered face.
  */
class EditDistanceSpec extends SparkSpec {

  private def ref(a: String, b: String, d: Int): Int = {
    // textbook full DP, thresholded afterwards — the independent oracle
    val n = a.length; val m = b.length
    val dp = Array.tabulate(n + 1, m + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to n; j <- 1 to m)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1)
        else math.min(dp(i - 1)(j - 1), math.min(dp(i - 1)(j), dp(i)(j - 1))) + 1
    if (dp(n)(m) <= d) dp(n)(m) else -1
  }

  private def nat(a: String, b: String, d: Int): Int =
    EditDistance.within(UTF8String.fromString(a), UTF8String.fromString(b), d)

  test("exhaustive parity on short alphabet-3 strings, d in 0..3") {
    val alpha = Seq("", "a", "b", "ab", "ba", "aab", "abc", "cab", "abab", "bcab")
    for (a <- alpha; b <- alpha; d <- 0 to 3)
      assert(nat(a, b, d) == ref(a, b, d), s"($a, $b, d=$d)")
  }

  test("seeded random near-copies and unrelated long strings") {
    val rnd = new scala.util.Random(42)
    def word() = (1 to 300).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 1 to 200) {
      val a = word()
      // near-copy: up to 6 random point edits
      val sb = new StringBuilder(a)
      val edits = rnd.nextInt(7)
      for (_ <- 1 to edits) {
        val p = rnd.nextInt(sb.length)
        rnd.nextInt(3) match {
          case 0 => sb.setCharAt(p, ('a' + rnd.nextInt(4)).toChar)
          case 1 => sb.deleteCharAt(p)
          case 2 => sb.insert(p, ('a' + rnd.nextInt(4)).toChar)
        }
      }
      val b = sb.toString
      for (d <- Seq(1, 4)) assert(nat(a, b, d) == ref(a, b, d), s"d=$d near")
      val c = word() // unrelated
      assert(nat(a, c, 4) == ref(a, c, 4), "unrelated")
    }
  }

  test("SQL face matches the builtin thresholded levenshtein on part names") {
    val named = graft.Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_name").as("a"),
        reverse(col("p_name")).as("b"))
    val diff = named
      .withColumn("x", expr("lev_within(a, b, 5)"))
      .withColumn("y", levenshtein(col("a"), col("b"), 5))
      .filter(col("x") =!= col("y"))
      .count()
    assert(diff == 0)
  }
}
