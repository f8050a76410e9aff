package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the batch CDC primitive: given two
  * snapshots of the same keyed table, classify every key as
  * insert / delete / update. This is how a lake pipeline derives a
  * changelog when the source can't emit one (nightly dumps, vendor
  * drops), the complement of `cdc_upsert_latest` which *applies* a
  * changelog.
  */
object DiffOps {

  /** Rows that changed between `oldDf` and `newDf`: emits the key
    * columns + `change ∈ ('insert','delete','update')`; unchanged keys
    * are dropped. Comparison is null-safe equality over `cmpCols`.
    *
    * @note scale: ONE shuffle — a full-outer sort-merge join on the
    *   key; both snapshots stream through it, so the op is bounded by
    *   shuffle bandwidth, not memory. If the snapshots are bucketed on
    *   the key (the natural layout for repeated diffs) the exchange
    *   disappears entirely. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], cmpCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && cmpCols.nonEmpty)
    // explicit presence markers: a row whose compare column is NULL is
    // still present — key-side null checks would misclassify it
    val o = oldDf.select((keyCols ++ cmpCols).map(col): _*)
      .toDF(keyCols ++ cmpCols.map("old_" + _): _*)
      .withColumn("old_present", lit(true))
    val n = newDf.select((keyCols ++ cmpCols).map(col): _*)
      .toDF(keyCols ++ cmpCols.map("new_" + _): _*)
      .withColumn("new_present", lit(true))
    val inOld = coalesce(col("old_present"), lit(false))
    val inNew = coalesce(col("new_present"), lit(false))
    val differs = cmpCols.map(c => !(col("old_" + c) <=> col("new_" + c)))
      .reduce(_ || _)
    o.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(!inOld, lit("insert"))
          .when(!inNew, lit("delete"))
          .when(differs, lit("update")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
