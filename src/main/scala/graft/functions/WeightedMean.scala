package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (`Aggregator[IN, BUF, OUT]`): exact weighted mean.
  *
  * The buffer keeps integer-scaled sums (micros) so merge order across
  * partitions cannot change the result — the same exactness discipline
  * as [[graft.operators.Relational.sumExact]], in typed form. Register
  * with `udaf(WeightedMean)` or use on a KeyValueGroupedDataset.
  */
final case class WmBuffer(weightedMicros: Long, weightMicros: Long)

object WeightedMean extends Aggregator[(Double, Double), WmBuffer, Double] {
  private val Scale = 1000000L

  private def toMicros(d: Double): Long = math.round(d * Scale)

  override def zero: WmBuffer = WmBuffer(0L, 0L)

  override def reduce(b: WmBuffer, in: (Double, Double)): WmBuffer = {
    val (value, weight) = in
    WmBuffer(
      b.weightedMicros + math.round((toMicros(value).toDouble / Scale) * toMicros(weight)),
      b.weightMicros + toMicros(weight))
  }

  override def merge(a: WmBuffer, b: WmBuffer): WmBuffer =
    WmBuffer(a.weightedMicros + b.weightedMicros, a.weightMicros + b.weightMicros)

  override def finish(b: WmBuffer): Double =
    if (b.weightMicros == 0L) Double.NaN
    else b.weightedMicros.toDouble / b.weightMicros.toDouble

  override def bufferEncoder: Encoder[WmBuffer] = Encoders.product[WmBuffer]
  override def outputEncoder: Encoder[Double]  = Encoders.scalaDouble
}
