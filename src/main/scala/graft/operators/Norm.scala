package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared column canonicalization for the document operators: one
  * definition so the (idCol, textCol) → (doc_id, text) contract cannot
  * drift between the dedup and text families. */
private[operators] object Norm {
  def normalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
}
