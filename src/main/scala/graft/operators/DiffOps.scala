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

  /** Apply a changelog to a snapshot — the inverse of [[snapshotDiff]]:
    * deletes remove their key, updates replace the row, inserts add it.
    * `changes` carries the key columns, the payload columns (ignored on
    * delete), and `opCol ∈ ('insert','update','delete')`.
    * `applyChangelog(old, diff(old,new) ⋈ new-payload) == new` — the
    * round-trip property [[graft.operators]] specs pin.
    *
    * @note scale: one anti-join on the key (changes side is the small
    *   delta — broadcast when it fits) plus a union; this is the MERGE
    *   INTO execution shape without a table format underneath. */
  def applyChangelog(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String = "change"): DataFrame = {
    val touchedKeys = changes.select(keyCols.map(col): _*).distinct()
    val survivors = base.join(touchedKeys, keyCols, "left_anti")
    val upserts = changes.filter(col(opCol) =!= "delete").drop(opCol)
    survivors.unionByName(upserts)
  }

  /** Conditional upsert — MERGE WHEN MATCHED AND newer THEN UPDATE,
    * WHEN NOT MATCHED THEN INSERT: incoming rows replace the base row
    * of their key only when strictly newer by `versionCols`
    * (lexicographic), and insert when the key is absent. This is the
    * idempotent merge a CDC consumer applies per batch — replaying an
    * old batch cannot regress the table.
    *
    * Both inputs must carry one row per key (compact first when not).
    *
    * @note scale: ONE full-outer join on the key; with both sides
    *   bucketed on the key the exchange disappears — the natural layout
    *   for a continuously merged table. */
  def mergeNewer(base: DataFrame, incoming: DataFrame,
      keyCols: Seq[String], versionCols: Seq[String]): DataFrame = {
    val dataCols = base.columns.filterNot(keyCols.contains).toSeq
    require(incoming.columns.sorted.sameElements(base.columns.sorted),
      "base and incoming must share a schema")
    val b = base.select(keyCols.map(col) ++
      dataCols.map(c => col(c).as("b_" + c)): _*)
    val i = incoming.select(keyCols.map(col) ++
      dataCols.map(c => col(c).as("i_" + c)): _*)
    val newer = versionCols.foldRight(lit(false)) { (vc, tieRest) =>
      col("i_" + vc) > col("b_" + vc) ||
        (col("i_" + vc) === col("b_" + vc) && tieRest)
    }
    val takeIncoming = col("b_" + versionCols.head).isNull || newer
    b.join(i, keyCols, "full_outer")
      .select(keyCols.map(col) ++ dataCols.map(c =>
        when(takeIncoming && col("i_" + versionCols.head).isNotNull,
          col("i_" + c)).otherwise(col("b_" + c)).as(c)): _*)
  }

  /** SCD2 (slowly-changing-dimension type 2) build from a keyed
    * changelog: collapse consecutive duplicates of the tracked
    * attribute, then stamp each surviving state with its validity
    * interval `[valid_from, valid_to)` (`valid_to` NULL on the current
    * row), a per-key version number, and an `is_current` flag — the
    * standard historized-dimension materialization.
    *
    * `orderCols` must be a deterministic total order within each key
    * (e.g. event time + a unique id as tiebreak); `valid_from` /
    * `valid_to` are taken from `tsCol` in that order.
    *
    * @note scale: both windows partition on the same key, so Catalyst
    *   plans ONE exchange + one sort and runs the change-collapse and
    *   the versioning in consecutive Window operators on the already
    *   partitioned/sorted stream. State per key is O(1). */
  def scd2(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      attrCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val changes = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> col(attrCol)))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols.map(col) ++ Seq(col("version"), col(attrCol),
        col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
