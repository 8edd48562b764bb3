package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Pca]] on PLANTED cluster structure: the registered
  * `label_scatter_*` queries prove the recurrence is exact (oracle
  * replay); this spec proves it FINDS the truth — centroids separated
  * along a known axis must yield that axis as pc1, a dominant
  * eigenvalue share, and a converged residual. (On the synthetic
  * corpus the scatter is spread over several axes — a property of that
  * data, which is why the recovery evidence lives here.)
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 8

  /** Three labels whose centroids sit at −δ, 0, +δ along axis 2, plus
    * a tiny per-label wiggle on axis 5 so the scatter isn't exactly
    * rank-1 (the realistic case power-by-squaring must cut through).
    * Two points per label, symmetric about the centroid on axis 0, so
    * WITHIN-label variance lives on an axis the scatter must ignore.
    */
  private lazy val planted = {
    def pt(label: Int, sep: Double, wiggle: Double, off: Double) = {
      val v = Array.fill(D)(0.0f)
      v(0) = off.toFloat; v(2) = sep.toFloat; v(5) = wiggle.toFloat
      (label.toLong, v.toSeq, label)
    }
    Seq(
      pt(0, -3.0, 0.1, 1.0), pt(0, -3.0, 0.1, -1.0),
      pt(1, 0.0, -0.2, 1.0), pt(1, 0.0, -0.2, -1.0),
      pt(2, 3.0, 0.1, 1.0), pt(2, 3.0, 0.1, -1.0)
    ).toDF("vec_id", "embedding", "label")
  }

  test("recovers the planted separation axis with dominant share") {
    val sc = Pca.labelScatter(planted, "embedding", D)
    val (lambda, v, resid, trace) = Pca.dominantDirection(sc.w, sc.dMat, squarings = 7)
    assert(math.abs(v(2)) > 0.99, v.toSeq)       // the separation axis
    assert(v(2) > 0, v.toSeq)                    // svd_flip sign: positive
    assert(math.abs(v(0)) < 1e-6, v.toSeq)       // within-label axis ignored
    assert(lambda / trace > 0.99, lambda / trace) // share: sep >> wiggle
    assert(resid < 1e-9, resid)                   // converged
  }

  test("weights reflect label frequencies and centroids are centered") {
    val sc = Pca.labelScatter(planted, "embedding", D)
    assert(sc.labels.toSeq == Seq(0, 1, 2))
    assert(sc.w.toSeq == Seq(1.0 / 3, 1.0 / 3, 1.0 / 3))
    // Σ w_l · d_l = 0 by construction of the centering
    for (i <- 0 until D) {
      val s = sc.w.indices.map(l => sc.w(l) * sc.dMat(l)(i)).sum
      assert(math.abs(s) < 1e-12, s"dim $i not centered: $s")
    }
  }
}
