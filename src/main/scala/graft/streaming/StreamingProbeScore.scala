package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Deploy the trained text-distillation head (`text_probe`) on a
  * stream: arriving documents are scored with the FROZEN model —
  * train-split standardization stats and GD weights fold in as
  * literals, exactly like the batch scorer — so the query is a pure
  * row-local projection: no aggregation, no watermark, no state store,
  * no shuffle. The train-batch / score-stream split is the production
  * shape of a quality gate (the classifier retrains on a cadence;
  * admission runs continuously), mirroring
  * [[StreamingIndexMaintenance]]'s frozen-codebook contract for ANN.
  *
  * Per-doc features come from the row's OWN token array (size /
  * array_distinct / filter-by-hash-bucket / aggregate) instead of the
  * batch pipeline's explode + groupBy: the values are IDENTICAL
  * (integer counts and the same ratios — StreamingProbeScoreSpec
  * asserts round-6-equal probabilities doc-for-doc against the batch
  * pipeline), and row-local is what makes the stream stateless. The
  * batch side deliberately keeps the explode shape — the array
  * higher-order functions are CodegenFallback interpreters, ~2× slower
  * per corpus pass (measured; argued in `textProbeRaw`) — but on a
  * stream the per-row interpreter cost buys away a per-batch shuffle.
  */
object StreamingProbeScore {

  /** Frozen model: train-split feature means/stds, trained weights
    * (w(0) the intercept), and the hash-bucket count — everything the
    * scorer needs, all model-sized (`ScaleQueries.textProbeModel`
    * extracts it from the batch pipeline with the same constants).
    */
  final case class ProbeModel(mean: Array[Double], std: Array[Double],
                              weights: Array[Double], buckets: Int)

  private def bucketOf(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets

  /** Row-local raw features r1..r{buckets+3}: bucket rates, token
    * count, type-token ratio, mean word length — the batch pipeline's
    * exact values. Reads the STAGED token/bucket columns: each token is
    * md5-bucketed exactly once (the `__b` transform in [[score]]); the
    * per-bucket counts then run over the small int array with no
    * hashing. The first cut evaluated `bucketOf` inside each bucket's
    * `filter` — `buckets` md5s per token per row (16× the hash work;
    * measured 6.6× wall-clock batch-scoring the sf0.1 corpus,
    * 3.79 s → 0.57 s min-of-2-warm, values doc-for-doc identical).
    */
  private def rawFeatures(t: Column, bks: Column, buckets: Int): Seq[Column] = {
    val n = size(t).cast("double")
    val dt = size(array_distinct(t)).cast("double")
    val chars = TextAnalysis.totalTokenLength(t).cast("double")
    (0 until buckets).map(b =>
      size(filter(bks, x => x === b)).cast("double") / n) ++
      Seq(n, dt / n, chars / n)
  }

  /** p = σ(w·x) with the frozen model as literals; `docs` may be a
    * streaming or a batch frame (pure projection either way). Emits
    * (doc_id, p round-6) — the same cell `linear_probe_score`-style
    * outputs hash on.
    *
    * Tokens and their buckets are staged in their own projections:
    * `__t` (and the md5-per-token `__b` transform) are referenced many
    * times downstream, and CollapseProject declines to inline a
    * non-cheap alias with multiple references — so each evaluates once
    * per row instead of once per reference.
    */
  def score(docs: DataFrame, m: ProbeModel): DataFrame = {
    val staged = docs
      .select(col("doc_id"),
        TextAnalysis.wordTokens(lower(col("text"))).as("__t"))
      .select(col("doc_id"), col("__t"),
        transform(col("__t"), tok => bucketOf(tok, m.buckets)).as("__b"))
    val raw = rawFeatures(col("__t"), col("__b"), m.buckets)
    val xs = lit(1.0) +: raw.indices.map(j =>
      when(lit(m.std(j)) === 0.0, 0.0)
        .otherwise((raw(j) - lit(m.mean(j))) / lit(m.std(j))))
    val z = xs.indices.map(j => lit(m.weights(j)) * xs(j)).reduce(_ + _)
    staged.select(col("doc_id"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("p"))
  }
}
