package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Single-key mirror of [[graft.Verify]]: dump one query's result +
  * its oracle SQL to `outDir` so `scripts/check.py` can gate just that
  * key — the fast loop while authoring a new capability. The key
  * argument accepts a comma-separated list to gate a few related keys
  * in one JVM (one oracle_sql.json covering all of them). */
object CheckOne {
  def main(args: Array[String]): Unit = {
    val Array(keyArg, sfDir, outDir) = args.take(3)
    val keys = keyArg.split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { key =>
      graft.SparkEntry.queries(key)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$key")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sql = keys.toSeq.flatMap(key => graft.SparkEntry.oracleSql.get(key)
      .map(o => s"${q(key)}: ${q(o)}")).mkString("{", ", ", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), sql)
    spark.stop()
  }
}
