package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 A4: approx_count_distinct is engine-specific (sketch), so
  * it carries no DuckDB-hashed key — its contract is relative error vs
  * the exact count, asserted here at the default rsd and a tighter one.
  */
class SketchAccuracySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("A4 approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.lineitem(spark, sf)
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey")).as("approx"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx_tight")).head()
    val exact = row.getLong(0).toDouble
    assert(math.abs(row.getLong(1) - exact) / exact <= 0.05,
      s"default rsd: ${row.getLong(1)} vs $exact")
    assert(math.abs(row.getLong(2) - exact) / exact <= 0.02,
      s"rsd=0.01: ${row.getLong(2)} vs $exact")
  }

  test("A4 approx_percentile within 1% of the exact quantile") {
    val li = Tables.lineitem(spark, sf)
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("approx")).head()
    val exact = row.getDouble(0)
    assert(math.abs(row.getDouble(1) - exact) / exact <= 0.01,
      s"approx p50 ${row.getDouble(1)} vs exact $exact")
  }

  test("SpaceSaving under capacity pressure: heavy hitters survive, bounds hold") {
    import spark.implicits._
    // Skew over 12 terms, freq(i) = (13-i)^3: the SpaceSaving presence
    // guarantee needs freq > N/capacity, which holds for the top terms
    // here (term-01: 1728 of N≈6000, N/8≈750); capacity 8 < 12 still
    // forces evictions in the tail.
    val data = scala.util.Random.shuffle(
      (for (i <- 1 to 12; _ <- 1 to (13 - i) * (13 - i) * (13 - i))
        yield f"term-$i%02d").toList)
    val ds = data.toDS().repartition(8)
    val ss = udaf(new graft.functions.SketchAggregators.SpaceSavingTopK(8),
      org.apache.spark.sql.Encoders.STRING)
    val got = ds.agg(ss(col("value")).as("t")).select(explode(col("t")).as("x"))
      .select(col("x._1"), col("x._2"), col("x._3"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // top-3 true heavy hitters must be present and correctly ordered
    val top3 = got.take(3).map(_._1).toSeq
    assert(top3 == Seq("term-01", "term-02", "term-03"), s"got $top3")
    // count bounds: true ∈ [cnt − err, cnt] for every reported term
    got.foreach { case (t, c, e) =>
      val truth = exact(t)
      assert(truth <= c && truth >= c - e, s"$t: true=$truth est=$c err=$e")
    }

    // ADVERSARIAL layout: range-partition the sorted stream so entire
    // terms are confined to single partitions — merges then combine
    // full summaries that have never seen each other's terms, the case
    // where crediting an absent term with 0 broke the upper bound.
    val sortedDs = data.sorted.toDS().repartitionByRange(8, col("value"))
    val got2 = sortedDs.agg(ss(col("value")).as("t")).select(explode(col("t")).as("x"))
      .select(col("x._1"), col("x._2"), col("x._3"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got2.take(3).map(_._1).toSeq == Seq("term-01", "term-02", "term-03"))
    got2.foreach { case (t, c, e) =>
      val truth = exact(t)
      assert(truth <= c && truth >= c - e,
        s"adversarial: $t true=$truth est=$c err=$e")
    }
  }
}
