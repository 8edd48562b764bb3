package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Similarity

/** Planted membership test for `decon_semantic`
  * ([[ScaleQueries.deconSemanticOn]]): eval vectors are the
  * vec_id % 101 = 0 slice; a training vector is dropped iff its cosine
  * to ANY eval vector reaches τ = 0.35.
  *
  * The plant (4-dim unit-ish vectors, eval ids 0 and 101):
  *   id 1 duplicates eval 0 exactly (cos 1.0)            → dropped;
  *   id 2 is orthogonal to both evals (cos 0.0)          → kept;
  *   id 3 has cos 0.30 to eval 0 (margin 0.05 below τ)   → kept;
  *   id 4 has cos 0.40 to eval 0 (margin 0.05 above τ)   → dropped;
  *   id 5 duplicates eval 101 — contamination via the SECOND eval
  *     vector, proving the ANY-eval semantics              → dropped.
  * Eval rows themselves never appear in the output (they are not
  * training data), dropped or kept.
  */
class DeconSemanticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private lazy val embs = Seq(
    (0L,   v(1, 0, 0, 0)),           // eval
    (101L, v(0, 0, 1, 0)),           // eval (101 % 101 = 0)
    (1L,   v(1, 0, 0, 0)),           // dup of eval 0
    (2L,   v(0, 1, 0, 0)),           // orthogonal
    (3L,   v(0.3, 0.9539392014, 0, 0)),  // cos 0.30 to eval 0
    (4L,   v(0.4, 0.9165151390, 0, 0)),  // cos 0.40 to eval 0
    (5L,   v(0, 0, 1, 0))            // dup of eval 101
  ).toDF("vec_id", "embedding")

  test("dropped iff cosine to any eval vector reaches the threshold") {
    val kept = ScaleQueries
      .deconSemanticOn(Similarity.prep(embs, "vec_id", "embedding"))
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L, 3L))
  }
}
