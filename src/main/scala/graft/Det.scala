package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for hash-matched DuckDB oracles (SURVEY.md §8.3).
  *
  * Floating-point SUM/AVG are order-dependent; Spark's partition-parallel
  * partial aggregation makes the last bits nondeterministic run-to-run and
  * engine-to-engine. We route every additive aggregate through
  * DECIMAL(18,4): the cast rounds each input once (deterministically), the
  * decimal sum is EXACT (128-bit internally in both Spark and DuckDB), and
  * the final value is rounded and cast back to double so output schemas
  * stay `double` on both sides.
  *
  * @note scale: exact decimal aggregation also makes results stable under
  *   repartitioning/AQE on a 1000-executor cluster — a correctness
  *   property, not just a test convenience. Decimal sum is marginally
  *   slower than double sum but stays inside whole-stage codegen.
  */
object Det {
  // Scale 6, not 4: generated money columns carry 2 decimals, so products
  // of up to three of them carry up to 6 — a scale-6 cast recovers the
  // EXACT decimal value (no half-way ties), whereas rounding those
  // products at 4 decimals hits exact .xxxx50 ties where Spark
  // (shortest-string HALF_UP) and DuckDB (binary nearest) disagree.
  private val D = DecimalType(18, 6)

  /** Exact additive sum: cast-to-decimal, sum, round(4), back to double. */
  def dsum(c: Column): Column = round(sum(c.cast(D)), 4).cast("double")

  /** Deterministic average via exact decimal mean, rounded to 4. */
  def davg(c: Column): Column = round(avg(c.cast(D)), 4).cast("double")

  /** Exact per-row value of a ≤6-decimal product, as double. */
  def d6(c: Column): Column = c.cast(D).cast("double")

  /** Oracle (DuckDB) fragment equivalent to [[dsum]]. */
  def osum(x: String): String =
    s"CAST(round(sum(CAST($x AS DECIMAL(18,6))),4) AS DOUBLE)"

  /** Oracle (DuckDB) fragment equivalent to [[davg]]. */
  def oavg(x: String): String =
    s"CAST(round(avg(CAST($x AS DECIMAL(18,6))),4) AS DOUBLE)"

  /** Oracle fragment equivalent to [[d6]]. */
  def od6(x: String): String = s"CAST(CAST($x AS DECIMAL(18,6)) AS DOUBLE)"
}

/** One registered capability: a DataFrame program plus (optionally) the
  * ANSI-SQL oracle the driver runs on DuckDB over the same parquet files.
  * Keys without an oracle get the driver's weaker rows-only check
  * (reserved for ops whose output is engine-specific, e.g. sketches).
  */
final case class Q(
    name: String,
    run: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Q =
    Q(name, run, Some(oracle))
  def noOracle(name: String)(
      run: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Q =
    Q(name, run, None)
}
