import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DbgEdit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.extensions","graft.functions.GraftExtensions")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Tables.documents(spark, "/tmp/stress10")
    val d = 4; val k = d + 1
    val base = df.select(col("doc_id").cast("long").as("id"), col("text").as("s"))
      .withColumn("len", length(col("s")).cast("int"))
    val s = base.filter(col("len") > d)
    def segLen(l: String, j: String) = s"(($l div $k) + IF($j >= $k - ($l % $k), 1, 0))"
    def segStart(l: String, j: String) = s"(1 + $j * ($l div $k) + GREATEST(0, $j - ($k - ($l % $k))))"
    def t[A](tag: String)(f: => A): A = { val t0=System.nanoTime; val r=f; println(f"[dbg] $tag: ${(System.nanoTime-t0)/1e9}%.1f s"); r }
    t("docs count")(println("docs=" + s.count()))
    val segs = s.select(col("id").as("aid"), col("len").as("la"),
        explode(expr(s"transform(sequence(0, $d), j -> struct(j AS i, xxhash64(substring(s, ${segStart("len","j")}, ${segLen("len","j")})) AS hs))")).as("g"))
      .select(col("aid"), col("la"), col("g.i"), col("g.hs"))
    t("segs count")(println("segs=" + segs.count()))
    val subs = s.select(col("id").as("bid"),
        explode(expr(
          s"""flatten(transform(sequence(GREATEST(${d+1}, len - $d), len), la ->
             |  flatten(transform(sequence(0, $d), j ->
             |    transform(sequence(
             |        GREATEST(1, ${segStart("la","j")} - $d),
             |        LEAST(len - ${segLen("la","j")} + 1, ${segStart("la","j")} + $d)),
             |      p -> struct(la AS la, j AS i, xxhash64(substring(s, p, ${segLen("la","j")})) AS hs))))))""".stripMargin)).as("g"))
      .select(col("bid"), col("g.la"), col("g.i"), col("g.hs"))
    t("subs count")(println("subs=" + subs.count()))
    val cand0 = segs.join(subs, Seq("la","i","hs")).filter(col("aid") =!= col("bid"))
    t("cand pre-distinct")(println("cand0=" + cand0.count()))
    val cand = cand0.select(least(col("aid"),col("bid")).as("ai"), greatest(col("aid"),col("bid")).as("bi")).distinct()
    t("cand distinct")(println("cand=" + cand.count()))
    val strs = base.select(col("id"), col("s"))
    val out = cand.join(strs.as("sa"), col("ai")===col("sa.id"))
      .join(strs.as("sb"), col("bi")===col("sb.id"))
      .withColumn("dist", levenshtein(col("sa.s"), col("sb.s"), d))
      .filter(col("dist") >= 0 && col("dist") <= d)
    t("verify")(println("out=" + out.count()))
    spark.stop()
  }
}
