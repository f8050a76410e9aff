package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 operator additions:
  *  - [[DedupOps.containmentPairsComplete]] (prefix-filtered complete
  *    containment join) against the df-capped form and the quote
  *    fixture;
  *  - [[DedupOps.editJoinExactLong]] (hashed-signature PassJoin)
  *    against the raw-substring [[DedupOps.editJoinExact]];
  *  - [[DedupOps.bandedCandidates]] recall on the near-dup fixture.
  */
class Round9OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("containmentPairsComplete equals the df-capped form where the cap is inert") {
    // fixture max shingle df ≈ 25 < 1000, so the capped form's candidate
    // contract covers every shared-shingle pair — the two forms must
    // agree exactly once both are thresholded
    val docs = graft.Tables.documents(spark, sf)
    val complete = DedupOps.containmentPairsComplete(docs, tNum = 4, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val capped = DedupOps.containmentPairs(docs)
      .filter(greatest(col("cont_a"), col("cont_b")) >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(complete.nonEmpty, "fixture must contain containment pairs")
    assert(complete == capped)
  }

  test("containmentPairsComplete catches the quoted-short-doc pair at t=4/5") {
    val sp = spark
    import sp.implicits._
    val quote = (1 to 10).map(i => s"q$i").mkString(" ")
    val long = ((1 to 60).map(i => s"w$i") :+ quote).mkString(" ")
    val df = Seq((1L, quote), (2L, long),
      (3L, (100 to 140).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val out = DedupOps.containmentPairsComplete(df, tNum = 4, tDen = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(out.head._3 >= 0.99, "short side fully contained")
  }

  test("containmentPairsComplete prefix survives a boundary-exact threshold") {
    // m = 5 shingles, t = 4/5: required overlap ceil(4·5/5) = 4, minus
    // the rounding-slack slot → prefix keeps ranks 1..2. A pair sharing
    // exactly 4 of 5 (cont = 0.8 exactly) must still surface — the
    // IEEE-ceil drift the rational arithmetic exists to avoid.
    val sp = spark
    import sp.implicits._
    // 7 tokens → 5 trigram shingles; change the LAST token only → the
    // two docs share exactly 3 shingles... use 8 tokens → 6 shingles,
    // docs share 4 of 6 (< t) vs change nothing cases. Simplest exact
    // case: doc B = doc A plus one extra trailing token → A has m
    // shingles all inside B: cont_a = 1 ≥ t.
    val a = (1 to 7).map(i => s"t$i").mkString(" ")
    val b = a + " t8"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = DedupOps.containmentPairsComplete(df, tNum = 4, tDen = 5).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
  }

  test("jaccardPairsComplete equals the df-capped form AND the LSH route at t=4/5") {
    val docs = graft.Tables.documents(spark, sf)
    val complete = DedupOps.jaccardPairsComplete(docs, tNum = 4, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = DedupOps.jaccardPairs(docs)
      .filter(col("jac") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(complete.nonEmpty, "fixture must contain jac >= 0.8 pairs")
    assert(complete == capped)
    // the deterministic-complete pair set certifies MinHash-LSH recall:
    // both routes emit the same jac >= 0.8 pairs on this corpus
    val lsh = DedupOps.minhashNearDups(docs, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == complete, "LSH route must match the complete contract")
  }

  test("jaccardPairsComplete at a lower threshold still matches the capped form") {
    val docs = graft.Tables.documents(spark, sf)
    val complete = DedupOps.jaccardPairsComplete(docs, tNum = 1, tDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = DedupOps.jaccardPairs(docs)
      .filter(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(complete.nonEmpty && complete == capped)
  }

  test("editJoinExactLong equals editJoinExact on the part-name fixture (d=2)") {
    val named = graft.Tables.part(spark, sf).groupBy("p_name")
      .agg(min("p_partkey").as("id"))
      .select(col("id").as("doc_id"), col("p_name").as("text"))
    val short = DedupOps.editJoinExact(named, maxDist = 2)
      .select("ai", "bi", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val long = DedupOps.editJoinExactLong(named, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(short.nonEmpty, "fixture must contain d<=2 name pairs")
    assert(long == short,
      "hashed-signature candidates must reproduce the raw-substring pair set")
  }

  test("editJoinExactLong finds the planted document near-dups at d=4") {
    val out = DedupOps.editJoinExactLong(graft.Tables.documents(spark, sf),
      maxDist = 4).collect()
    assert(out.nonEmpty, "planted token-substitution dups sit at char distance <= 4")
    assert(out.forall(_.getInt(2) <= 4))
  }

  test("bandedCandidates covers every Jaccard >= 0.8 pair on the fixture") {
    val hs = DedupOps.hashedShingles(graft.Tables.documents(spark, sf))
    val cands = DedupOps.bandedCandidates(hs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = DedupOps.jaccardPairs(graft.Tables.documents(spark, sf))
      .filter(col("jac") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(truth.subsetOf(cands),
      "LSH banding must recall every >= 0.8 pair on this corpus")
  }
}
