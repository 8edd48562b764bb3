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

  test("jacobiEigen recovers a planted spectrum exactly") {
    // A = R diag(9, 4, 1, 0.25) Rᵀ with R a known product of plane
    // rotations — eigenvalues and (sign-fixed) eigenvectors are known.
    val d = 4
    val diag = Array(9.0, 4.0, 1.0, 0.25)
    var r = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def rot(p: Int, q: Int, ang: Double): Unit = {
      val (c, s) = (math.cos(ang), math.sin(ang))
      for (i <- 0 until d) {
        val vp = r(i)(p); val vq = r(i)(q)
        r(i)(p) = c * vp - s * vq; r(i)(q) = s * vp + c * vq
      }
    }
    rot(0, 1, 0.7); rot(1, 2, -0.3); rot(2, 3, 1.1); rot(0, 3, 0.4)
    val a = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => r(i)(k) * diag(k) * r(j)(k)).sum)
    val (ev, vecs, offFro) = Pca.jacobiEigen(a, sweeps = 12)
    assert(offFro < 1e-12, s"not converged: $offFro")
    for (k <- 0 until d)
      assert(math.abs(ev(k) - diag(k)) < 1e-12, s"lambda $k: ${ev(k)}")
    // eigenvectors match the planted rotation columns up to sign,
    // and A v = λ v holds
    for (k <- 0 until d) {
      val v = (0 until d).map(i => vecs(i)(k))
      val av = (0 until d).map(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      for (i <- 0 until d)
        assert(math.abs(av(i) - ev(k) * v(i)) < 1e-10, s"Av!=lv at ($i,$k)")
      val dotR = (0 until d).map(i => v(i) * r(i)(k)).sum
      assert(math.abs(math.abs(dotR) - 1.0) < 1e-10, s"vec $k: $dotR")
    }
  }

  test("zcaWhitenMatrix whitens a planted anisotropic covariance to identity") {
    // planted covariance: strong anisotropy (condition number 400)
    val d = 4
    val a = Array(
      Array(10.0, 3.0, 0.5, 0.0),
      Array(3.0, 5.0, 1.0, 0.2),
      Array(0.5, 1.0, 2.0, 0.1),
      Array(0.0, 0.2, 0.1, 0.05))
    val (ev, vecs, _) = Pca.jacobiEigen(a, sweeps = 12)
    assert(ev.forall(_ > 0), ev.toSeq) // PSD plant
    val w = Pca.zcaWhitenMatrix(ev, vecs, floor = 1e-12)
    // W C Wᵀ = I to machine precision
    val wc = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => w(i)(k) * a(k)(j)).sum)
    val wcw = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => wc(i)(k) * w(j)(k)).sum)
    for (i <- 0 until d; j <- 0 until d) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(wcw(i)(j) - expect) < 1e-10, s"($i,$j): ${wcw(i)(j)}")
    }
    // W is symmetric (the ZCA property: closest whitening to identity)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(w(i)(j) - w(j)(i)) < 1e-12)
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
