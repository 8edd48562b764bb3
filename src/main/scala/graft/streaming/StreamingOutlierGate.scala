package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming embedding-outlier gate — the stream sibling of
  * `emb_outliers` and the whitening family's deployment half: arriving
  * vectors score m² = w₁² + w₂² against a FROZEN whitening model
  * (axes, mean, eigenvalues trained batch-side and folded in as
  * LITERALS — the StreamingIndexMaintenance frozen-model contract),
  * and the χ²₂ flag marks vectors the Gaussian bulk disowns before
  * they poison a codebook or probe. Pure row-local projection:
  * stateless, no watermark, no shuffle — admits in the arrival
  * micro-batch at any throughput, and the model refreshes on the same
  * cadence the drift monitors (`ann_index_health`,
  * StreamingDriftMonitor) already govern.
  */
object StreamingOutlierGate {

  /** The frozen rank-2 whitening model (model-sized driver output of
    * the batch covariance pass + deflation).
    */
  final case class WhitenModel(v1: Array[Double], v2: Array[Double],
                               mu: Array[Double], l1: Double, l2: Double)

  /** χ²₂ 99% threshold on m² (p < 0.01 under the whitened bulk). */
  val Chi2_99 = 9.21

  /** Score a (vec_id, embedding) stream; works on a batch frame too —
    * the spec's parity path. Emits (vec_id, m2, beyond_chi2_99).
    */
  def gate(vecs: DataFrame, m: WhitenModel): DataFrame = {
    val d = m.v1.length
    def coord(v: Array[Double], l: Double) = (1 to d).map(i =>
      lit(v(i - 1)) * (element_at(col("embedding"), i).cast("double") - lit(m.mu(i - 1))))
      .reduce(_ + _) / lit(math.sqrt(l))
    val w1 = coord(m.v1, m.l1)
    val w2 = coord(m.v2, m.l2)
    val m2 = w1 * w1 + w2 * w2
    vecs.select(col("vec_id"), round(m2, 6).as("m2"),
      (m2 > Chi2_99).cast("long").as("beyond_chi2_99"))
  }
}
