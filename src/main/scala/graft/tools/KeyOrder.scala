package graft.tools

/** Print the position of the given keys in `SparkEntry.queries`
  * iteration order — the order [[graft.Bench]] times them in. Key
  * additions reshuffle the underlying hash map, which moves which key
  * pays a shared first-compilation cost (see BASELINE.md on
  * `graph_pagerank`). */
object KeyOrder {
  def main(args: Array[String]): Unit = {
    val ks = graft.SparkEntry.queries.keys.toSeq
    val targets = if (args.nonEmpty) args.toSeq else ks
    targets.foreach(k => println(s"[keyorder] $k -> ${ks.indexOf(k)}"))
    println(s"[keyorder] total ${ks.size}")
  }
}
