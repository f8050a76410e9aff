package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Lake schema evolution: files written before a column existed must
  * stay readable next to files written after — `mergeSchema` unions
  * the footers and nulls the missing column, and an explicit read
  * schema does the same without the footer-sampling pass. */
class SchemaEvolutionSpec extends SparkSpec {

  test("old and new parquet footers read as one evolved table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/old")
    Seq((3L, "c", 9.5), (4L, "d", 7.0)).toDF("id", "name", "score")
      .write.parquet(s"$dir/new")

    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/old", s"$dir/new")
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(merged.count() == 4)
    assert(merged.filter(col("score").isNull).count() == 2,
      "pre-evolution rows surface the new column as null")
    assert(merged.agg(sum("score")).head.getDouble(0) == 16.5)

    // explicit-schema read (the Tables.scala discipline): same result,
    // no footer sampling
    val explicit = spark.read.schema(merged.schema)
      .parquet(s"$dir/old", s"$dir/new")
    assert(explicit.count() == 4)
    assert(explicit.filter(col("score").isNull).count() == 2)
  }
}
