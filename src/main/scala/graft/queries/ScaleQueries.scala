package graft.queries

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Scale-technique operators: patterns whose *result* is identical to a
  * plain formulation (so the DuckDB oracle is the plain SQL) but whose
  * *plan* demonstrates the 100 TB mechanics.
  */
object ScaleQueries {

  /** Skew-salted join: the fact side gets a deterministic salt
    * (key mod S), the dimension side is replicated S ways, and the join
    * runs on (key, salt) — splitting any hot key's rows across S tasks.
    * Result ≡ the unsalted join, which is exactly what the oracle runs.
    *
    * @note scale: AQE's OptimizeSkewedJoin handles moderate skew
    *   automatically; manual salting is for pathological power-law keys
    *   (one user = 10% of a 100 TB fact table) where even a split
    *   partition's build side overflows. S sizes to ~2× executor count;
    *   the dim replication cost is S× a broadcast-sized table. */
  private val joinSkewSalted = Q(
    "join_skew_salted",
    s"""SELECT o.o_orderpriority, count(*) AS n, ${Det.osum("l.l_extendedprice")} AS revenue
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val S = 8
    val fact = Tables.lineitem(s, d)
      .withColumn("salt", pmod(col("l_orderkey"), lit(S)))
    val dim = Tables.orders(s, d)
      .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
    fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey") && fact("salt") === dim("salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[Q] = Seq(joinSkewSalted)
}
