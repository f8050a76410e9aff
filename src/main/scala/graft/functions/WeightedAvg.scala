package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom UDAF surface (SURVEY.md §2.4 A7 / §2.11 X2): weighted average,
  * the classic Flink `AggregateFunction` demo, as a typed Spark
  * `Aggregator` registered through `functions.udaf`.
  *
  * The buffer carries EXACT decimal sums (inputs are rounded once to
  * scale 6, mirroring `CAST(x AS DECIMAL(18,6))`), so merge order across
  * partitions cannot perturb the result — the same cross-engine
  * determinism contract as [[graft.Det]].
  *
  * @note scale: the buffer is two BigDecimals (constant size), partials
  *   combine associatively → map-side partial aggregation applies and the
  *   shuffle carries one buffer per (partition, key).
  */
case class WavgBuf(svw: BigDecimal, sw: BigDecimal)

object WeightedAvg extends Aggregator[(Double, Double), WavgBuf, Double] {
  private val S = 6

  override def zero: WavgBuf = WavgBuf(BigDecimal(0), BigDecimal(0))

  override def reduce(b: WavgBuf, in: (Double, Double)): WavgBuf = {
    val v = BigDecimal(in._1).setScale(S, BigDecimal.RoundingMode.HALF_UP)
    val w = BigDecimal(in._2).setScale(S, BigDecimal.RoundingMode.HALF_UP)
    WavgBuf(b.svw + v * w, b.sw + w)
  }

  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(a.svw + b.svw, a.sw + b.sw)

  /** Exact-decimal sums → double division → round(4); mirrors the oracle
    * `round(CAST(sum(vd*wd) AS DOUBLE) / CAST(sum(wd) AS DOUBLE), 4)`. */
  override def finish(r: WavgBuf): Double =
    if (r.sw.signum == 0) 0.0
    else BigDecimal(r.svw.toDouble / r.sw.toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
