package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ProfileOps.keySkew]] — the pre-shuffle skew diagnostic: heaviest
  * keys first, share sums to ≤ 1, and x_mean is the multiple-of-mean
  * reducer load that tells you which key to salt.
  */
class KeySkewSpec extends SparkSpec {

  test("hot key surfaces first with exact share and x_mean") {
    val sp = spark
    import sp.implicits._
    // 4 keys: one hot (6 rows), three cold (2, 1, 1) — mean load 2.5
    val df = (Seq.fill(6)("hot") ++ Seq("a", "a", "b", "c"))
      .toDF("k").withColumn("v", lit(1))
    val out = ProfileOps.keySkew(df, "k", 3).collect()
    assert(out.length == 3)
    val top = out.head
    assert(top.getString(0) == "hot" && top.getLong(1) == 6L)
    assert(top.getDouble(2) == 0.6, "share = 6/10")
    assert(top.getDouble(3) == 2.4, "x_mean = 6 / (10/4 mean)")
    // ties (a=2 beats b=1, b before c by key tiebreak)
    assert(out(1).getString(0) == "a" && out(2).getString(0) == "b")
  }

  test("k larger than the key count returns all keys; k must be positive") {
    val sp = spark
    import sp.implicits._
    val df = Seq("x", "y").toDF("k")
    assert(ProfileOps.keySkew(df, "k", 10).count() == 2)
    intercept[IllegalArgumentException](ProfileOps.keySkew(df, "k", 0))
  }
}
