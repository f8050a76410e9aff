package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc SQL probe: registers the sf tables as temp views and runs one
  * SQL string from the command line — for checking dialect support
  * (e.g. WITH RECURSIVE) and plan shapes without writing a key first.
  * Run: `sbt "runMain graft.tools.SqlProbe /root/testdata/sf0.001 'SELECT 1'"`;
  * pass `@/path/to/file.sql` to read the statement from a file (sbt's
  * runMain arg splitting eats newlines in quoted args).
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sql =
      if (args(1).startsWith("@"))
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(args(1).drop(1))), "UTF-8")
      else args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      graft.Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    graft.Tables.events(spark, sfDir).createOrReplaceTempView("events")
    val df = spark.sql(sql)
    df.show(50, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
