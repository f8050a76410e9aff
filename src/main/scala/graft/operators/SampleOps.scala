package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling — the training-mixture primitives. A sample
  * used to assemble a corpus must be REPRODUCIBLE: membership decided
  * by a pure function of the row id, never an RNG, so re-running the
  * pipeline, resharding the data, or re-expressing the query in another
  * engine yields the identical sample (the oracle regression-tests
  * exactly that cross-engine claim).
  *
  * @note scale: both ops are narrow — a filter on a per-row hash (plus
  *   one broadcast of the metadata-sized rates table for the mixture);
  *   no shuffle, no driver state, fully codegen'd arithmetic.
  */
object SampleOps {

  private val M = 2147483648L // 2^31
  private val Knuth = 2654435761L // Knuth multiplicative constant

  /** `h(id) ∈ [0, 2^31)`: multiplicative hash with engine-portable
    * arithmetic — operands stay below 2^62, so no BIGINT overflow in
    * engines that error on wrap (DuckDB) and no wrap in engines that
    * don't (Spark). */
  def idHash(id: Column, salt: Long = 0L): Column =
    pmod(pmod(id, lit(M)) * lit(Knuth) + lit(salt), lit(M))

  /** DuckDB fragment computing [[idHash]] for a non-negative id. */
  def oIdHash(id: String, salt: Long = 0L): String =
    s"((($id % $M) * $Knuth + $salt) % $M)"

  /** Keep ~`rate` of rows, membership a pure function of the id. */
  def hashSample(df: DataFrame, rate: Double, idCol: String = "doc_id",
      salt: Long = 0L): DataFrame =
    df.filter(idHash(col(idCol), salt) < lit((rate * M).toLong))

  /** Stratified mixture sampling: `rates` is a metadata-sized
    * `(stratumCol, rate)` table — e.g. web 10%, books 80%, code 100% —
    * broadcast against the corpus; a stratum with no rate row drops
    * entirely. This is how a training mixture is reweighted without
    * materializing per-source copies. */
  def mixtureSample(df: DataFrame, rates: DataFrame,
      stratumCol: String = "source", idCol: String = "doc_id",
      salt: Long = 0L): DataFrame =
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(idHash(col(idCol), salt) <
        floor(col("rate") * lit(M.toDouble)).cast("long"))
      .drop("rate")

  /** Exactly-n-per-stratum sample: rank rows inside each stratum by the
    * deterministic id hash (id as tiebreak) and keep the first `n` —
    * the "give me 10k docs from every source" primitive, reproducible
    * across reruns, reshards, and engines like the rate-based ops.
    *
    * @note scale: one shuffle on the stratum key. A web-scale stratum
    *   makes that a skewed window; the two-phase fix is a rate-based
    *   [[hashSample]] pre-filter sized to ~3n expected survivors per
    *   stratum, then this exact rank on the survivors — same result,
    *   bounded partition size. */
  def stratifiedSample(df: DataFrame, n: Int, stratumCol: String = "source",
      idCol: String = "doc_id", salt: Long = 0L): DataFrame =
    df.withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol))
          .orderBy(idHash(col(idCol), salt), col(idCol))))
      .filter(col("__rk") <= n).drop("__rk")
}
