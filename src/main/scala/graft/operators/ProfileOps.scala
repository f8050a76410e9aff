package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — the "look before you train" pass over a new
  * source. Pure aggregates: one partial+final hash agg per call, no
  * driver state, any corpus size.
  */
object ProfileOps {

  /** Fixed-width histogram of a numeric column: `(bin, n, mass)` with
    * `bin = min(floor(value / width), maxBin)` — the last bin is
    * open-ended so outliers can't explode the bin count. */
  def histogram(df: DataFrame, valueCol: Column, width: Double,
      maxBin: Int): DataFrame = {
    require(width > 0 && maxBin >= 0)
    df.groupBy(least(floor(valueCol / width), lit(maxBin))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(valueCol).as("mass"))
      .orderBy("bin")
  }

  /** Stacked per-column summary — one row per profiled column with
    * `(col_name, n, n_null, n_distinct, mn, mx)`; the long shape keeps
    * the schema fixed however many columns are profiled. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    cols.map { c =>
      df.agg(count(lit(1)).as("n"),
          sum(when(col(c).isNull, 1).otherwise(0)).as("n_null"),
          count_distinct(col(c)).as("n_distinct"),
          round(min(col(c)), 6).as("mn"), round(max(col(c)), 6).as("mx"))
        .withColumn("col_name", lit(c))
        .select("col_name", "n", "n_null", "n_distinct", "mn", "mx")
    }.reduce(_ unionByName _).orderBy("col_name")
  }
}
