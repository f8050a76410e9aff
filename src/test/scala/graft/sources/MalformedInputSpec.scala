package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Ingest robustness — a 100 TB lake always contains garbage rows, and
  * the three CSV parse modes are the contract for what happens to them:
  * PERMISSIVE quarantines (corrupt-record column), DROPMALFORMED
  * silently drops, FAILFAST aborts. */
class MalformedInputSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("badcsv").toString
    Files.writeString(Paths.get(s"$d/part0.csv"),
      """1,alice,10.5
        |2,bob,not-a-number
        |3,carol,7.25
        |garbage line with,too,many,fields,entirely
        |4,dave,1.0
        |""".stripMargin)
    d
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE quarantines bad rows into the corrupt-record column") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache() // corrupt-record column requires a materialized parse
    assert(df.count() == 5)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 2, "the non-numeric and wrong-arity lines")
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.select(sum("score")).head.getDouble(0) == 18.75)
  }

  test("DROPMALFORMED keeps only clean rows") {
    val clean = spark.read
      .schema(StructType(schema.fields.filterNot(_.name.startsWith("_"))))
      .option("mode", "DROPMALFORMED").csv(dir)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L))
  }

  test("FAILFAST aborts on the first bad row") {
    val ex = intercept[Exception] {
      spark.read
        .schema(StructType(schema.fields.filterNot(_.name.startsWith("_"))))
        .option("mode", "FAILFAST").csv(dir).collect()
    }
    assert(ex.getMessage != null)
  }
}
