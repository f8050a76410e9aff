package graft.operators

import graft.SparkSpec
import graft.functions.Hashes
import org.apache.spark.sql.functions.col

/** The native `poly_hash` expression must equal the higher-order-fold
  * reference on every string the fixtures can produce — including the
  * edge cases the loop has to get right by construction (empty string,
  * single char, spaces, long strings near the modulus). */
class HashesParitySpec extends SparkSpec {

  test("native poly_hash == HOF reference on edge cases and fixture text") {
    import spark.implicits._
    val edge = Seq("", "a", " ", "ab", "a b", "zzzzzz",
      "the quick brown fox", "x" * 500).toDF("s")
    val fixture = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text").as("s"))
    val both = edge.union(fixture)
      .select(Hashes.polyHash(col("s")).as("native"),
        Hashes.polyHashRef(col("s")).as("ref"))
    assert(both.filter(col("native") =!= col("ref")).count() == 0)
    // and the known base cases pin the fold direction + seed
    val m = both.limit(2).collect()
    assert(m.forall(r => r.getLong(0) == r.getLong(1)))
    val one = edge.filter(col("s") === "a")
      .select(Hashes.polyHash(col("s"))).as[Long].head()
    assert(one == 'a'.toLong) // h = (31*0 + 97) % P
  }
}
