package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (`Aggregator[IN, BUF, OUT]`): weighted mean with
  * merge-order-invariant buffers.
  *
  * The buffer keeps integer-scaled sums (micros, rounded once per row
  * from an EXACT BigDecimal product) so partition merge order cannot
  * change the result — the same determinism discipline as
  * [[graft.operators.Relational.sumExact]], in typed form. Values whose
  * scaled sums would overflow a Long throw (ArithmeticException) rather
  * than silently saturating. Register with `udaf(WeightedMean)`.
  */
final case class WmBuffer(weightedMicros: Long, weightMicros: Long)

object WeightedMean extends Aggregator[(Double, Double), WmBuffer, Double] {
  private val Scale = 6 // micros

  private def productMicros(v: Double, w: Double): Long =
    java.math.BigDecimal.valueOf(v).multiply(java.math.BigDecimal.valueOf(w))
      .movePointRight(Scale)
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .longValueExact() // exact; throws instead of corrupting on overflow

  private def toMicros(d: Double): Long =
    java.math.BigDecimal.valueOf(d).movePointRight(Scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  override def zero: WmBuffer = WmBuffer(0L, 0L)

  override def reduce(b: WmBuffer, in: (Double, Double)): WmBuffer = {
    val (value, weight) = in
    WmBuffer(
      Math.addExact(b.weightedMicros, productMicros(value, weight)),
      Math.addExact(b.weightMicros, toMicros(weight)))
  }

  override def merge(a: WmBuffer, b: WmBuffer): WmBuffer =
    WmBuffer(Math.addExact(a.weightedMicros, b.weightedMicros),
      Math.addExact(a.weightMicros, b.weightMicros))

  override def finish(b: WmBuffer): Double =
    if (b.weightMicros == 0L) Double.NaN
    else b.weightedMicros.toDouble / b.weightMicros.toDouble

  override def bufferEncoder: Encoder[WmBuffer] = Encoders.product[WmBuffer]
  override def outputEncoder: Encoder[Double]  = Encoders.scalaDouble
}
