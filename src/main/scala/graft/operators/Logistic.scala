package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed full-batch logistic regression by unrolled gradient
  * descent — the "linear probe / quality classifier head" of a
  * model-in-the-loop curation pipeline (CCNet/fastText-style corpus
  * scoring, DSIR's cousin: train a cheap head, score every document,
  * gate on the score).
  *
  * Contract: the feature frame carries a double label `y` ∈ {0,1} and
  * feature columns `x0..x{n-1}` (x0 is conventionally the intercept).
  * Each of the `iters` steps is ONE corpus-wide aggregation — the
  * per-row sigmoid runs inside codegen with the current weights folded
  * in as literals, the gradient's n partial sums combine map-side, and
  * only the n-dim weight vector lives on the driver (the pagerank
  * pattern: model-sized driver state, corpus-sized distributed agg).
  * At 100 TB that is `iters` scan-bound passes with no shuffle beyond
  * the aggregation exchanges, and nothing is pinned in memory between
  * passes — deliberately NO Materialize on the feature frame, whose
  * recompute is a projection over a pruned scan while a checkpoint
  * would pin a corpus-sized frame for the loop's lifetime.
  *
  * Determinism: fixed zero init, fixed iteration count, fixed learning
  * rate, pure double math — the same unrolled recurrence is expressible
  * as a SQL CTE chain, which is how the `linear_probe*` queries'
  * DuckDB oracles replay the whole training run (weights cross-checked
  * to 1e-6 after round-6, like every other double-fold oracle here).
  */
object Logistic {

  /** w·x over feature columns x0..x{n-1} with the weights as literals
    * (codegen folds them; no join against a weight frame).
    */
  def margin(w: Seq[Double]): Column =
    w.indices.map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)

  /** σ(w·x), the predicted probability under weights `w`. */
  def prob(w: Seq[Double]): Column =
    lit(1.0) / (lit(1.0) + exp(-margin(w)))

  /** `iters` steps of full-batch gradient descent from zero init:
    * w ← w − lr · (1/N) Σ (σ(w·x) − y) x. Returns the final weights.
    * One aggregation job per step runs at CALL time (the iterative
    * trainer precedent: `bpe_merges`).
    */
  def train(feats: DataFrame, nFeatures: Int, iters: Int,
            lr: Double): Seq[Double] = {
    var w: Seq[Double] = Seq.fill(nFeatures)(0.0)
    for (_ <- 1 to iters) {
      val p = prob(w)
      val grads = (0 until nFeatures).map(j =>
        (sum((p - col("y")) * col(s"x$j")) / count(lit(1))).as(s"g$j"))
      val g = feats.agg(grads.head, grads.tail: _*).head()
      w = (0 until nFeatures).map(j => w(j) - lr * g.getDouble(j))
    }
    w
  }

  /** Probability clamp shared by [[logLoss]] and its SQL oracle
    * mirrors: with the trained probes' bounded steps the round-trip
    * probability never reaches 0/1, but a caller with a hotter
    * schedule could saturate σ and turn ln(p) into -Infinity — the
    * clamp makes that a bounded-loss row instead of a NaN aggregate.
    * ln(1-1e-15) ≈ -1e-15 rounds to 0 at the 6th decimal, so on
    * non-saturating data the clamp is value-invisible.
    */
  val ProbEps = 1e-15

  /** Mean binary cross-entropy of `w` on the feature frame, as a
    * single-row (log_loss, n) aggregate. Probabilities are clamped
    * into [ [[ProbEps]], 1−[[ProbEps]] ] (mirrored in the generated
    * SQL oracles) so a saturated sigmoid yields a finite loss rather
    * than -Infinity/NaN.
    */
  def logLoss(feats: DataFrame, w: Seq[Double]): DataFrame = {
    val p = greatest(least(prob(w), lit(1.0 - ProbEps)), lit(ProbEps))
    feats.agg(
      (-sum(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p))
        / count(lit(1))).as("log_loss"),
      count(lit(1)).cast("long").as("n"))
  }
}
