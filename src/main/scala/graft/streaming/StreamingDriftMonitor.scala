package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Event-time drift monitoring of an arrival stream against a FROZEN
  * training baseline: each arriving document scores row-locally
  * (the `quality_score` kernel), lands in a fixed decile bin, and ONE
  * watermarked tumbling-window aggregation builds the window's whole
  * histogram ([[Bins]] conditional counts) — PSI against the
  * train-time bin shares then folds as a row-local expression over
  * the aggregated row with the baseline as literals. This is the
  * quality-gate sibling of [[StreamingIndexMaintenance]]'s codebook
  * drift contract (`ann_index_health`): the probe/gate retrains on a
  * cadence; this monitor says WHEN — sustained PSI above the alert
  * band means arrivals no longer look like the corpus the gate was
  * tuned on.
  *
  * Shape: exactly one stateful operator (the windowed aggregation,
  * watermark-bounded state), append output — a window emits once the
  * watermark passes its end, the standard event-time contract. Both
  * histogram sides are add-one smoothed, so empty bins are finite and
  * both engines/paths agree; StreamingDriftMonitorSpec pins streamed
  * window PSIs to an independent driver-side recomputation and shows
  * a planted low-quality window alerting while a representative
  * window stays quiet.
  */
object StreamingDriftMonitor {

  val Bins = 10

  private def binOf(q: Column): Column =
    least(floor(q * Bins), lit(Bins - 1)).cast("int")

  /** Frozen baseline: add-one-smoothed per-bin shares of the TRAIN
    * corpus's round-6 quality score. Model-sized (Bins doubles).
    */
  def trainBaseline(docs: DataFrame): Array[Double] = {
    val rows = docs
      .select(binOf(TextAnalysis.qualityScore(col("text"))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c")).collect()
    val counts = Array.fill(Bins)(0L)
    rows.foreach(r => counts(r.getInt(0)) = r.getLong(1))
    val n = counts.sum.toDouble
    counts.map(c => (c + 1.0) / (n + Bins))
  }

  /** Windowed PSI of a (ts, text) stream vs the frozen baseline.
    * Works on a batch frame too (withWatermark is a no-op there) —
    * the spec's parity path.
    */
  def psi(docs: DataFrame, baseline: Array[Double],
          windowLen: String, watermark: String): DataFrame = {
    require(baseline.length == Bins)
    val staged = docs.select(col("ts"),
      binOf(TextAnalysis.qualityScore(col("text"))).as("bin"))
    val aggs = (0 until Bins).map(b =>
      sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"c$b")) :+
      count(lit(1)).as("n")
    val h = staged.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(aggs.head, aggs.tail: _*)
    val n = col("n").cast("double")
    val terms = (0 until Bins).map { b =>
      val p = (col(s"c$b").cast("double") + 1.0) / (n + Bins)
      val q = lit(baseline(b))
      (p - q) * log(p / q)
    }
    h.select(col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      col("n").as("n_docs"),
      round(terms.reduce(_ + _), 6).as("psi"))
  }
}
