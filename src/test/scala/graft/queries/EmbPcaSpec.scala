package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Pca

/** `emb_pca` on a PLANTED low-rank corpus: the registered queries
  * prove the recurrence is exact (oracle replay); this spec proves the
  * covariance pass + symmetric solve FIND the truth — a corpus built
  * as strong variance along one known axis plus weak isotropic noise
  * must yield that axis as pc1, the planted variance as λ₁, and a
  * converged residual. Also pins the one-pass covariance itself
  * against a driver-side recompute (the 2 145-column aggregation is
  * the operator's scale story; its correctness must not ride only on
  * the eigensolve's tolerance).
  */
class EmbPcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 8
  private val N = 40

  /** x_k = s_k · u + tiny deterministic per-dim jitter, with s_k
    * symmetric about a NONZERO mean (so the mean-removal path is
    * exercised), u = (3,4)/5 on axes 1 and 3. Planted population
    * variance along u: var(s) · 1 = 4.0 per the s_k grid below.
    */
  private val u = Array(0.0, 0.6, 0.0, 0.8, 0.0, 0.0, 0.0, 0.0)

  private lazy val planted = {
    val rows = (0 until N).map { k =>
      val s = 2.0 * (k % 5 - 2) + 1.0 // grid {-3,-1,1,3,5}, mean 1, var 8
      val jit = 0.001 * ((k * 7919) % 11 - 5)
      val v = Array.tabulate(D)(i => (s * u(i) + (if (i == (k % D)) jit else 0.0)).toFloat)
      (k.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("one-pass covariance equals a driver-side recompute") {
    val got = ScaleQueries.embPcaCovOf(planted, D)
    // independent recompute: collect raw vectors, plain Scala sums
    val xs = planted.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n = xs.length.toDouble
    val mu = Array.tabulate(D)(i => xs.map(_(i)).sum / n)
    for (i <- 0 until D; j <- 0 until D) {
      val cij = xs.map(x => x(i) * x(j)).sum / n - mu(i) * mu(j)
      assert(math.abs(got(i)(j) - cij) < 1e-12, s"C($i,$j): ${got(i)(j)} vs $cij")
    }
  }

  test("deflation recovers a planted SECOND axis orthogonal to the first") {
    // strong variance on u (axes 1,3), weaker on w = axis 6, noise tiny
    val w = Array(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    val rows = (0 until N).map { k =>
      val s1 = 2.0 * (k % 5 - 2) + 1.0           // var 8 along u
      val s2 = if (k % 2 == 0) 1.5 else -1.5     // var 2.25 along w
      val v = Array.tabulate(D)(i => (s1 * u(i) + s2 * w(i)).toFloat)
      (k.toLong, v.toSeq)
    }
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    val c = ScaleQueries.embPcaCovOf(df, D)
    val (l1, v1, _, _) = Pca.dominantOfSymmetric(c, squarings = 12)
    val c2 = Array.tabulate(D, D)((i, j) => c(i)(j) - l1 * v1(i) * v1(j))
    val (l2, v2, resid2, _) = Pca.dominantOfSymmetric(c2, squarings = 12)
    val align2 = v2.indices.map(i => v2(i) * w(i)).sum
    assert(math.abs(align2) > 0.9999, v2.toSeq)
    assert(math.abs(l2 - 2.25) < 1e-9, l2)
    assert(math.abs(v1.indices.map(i => v1(i) * v2(i)).sum) < 1e-12)
    assert(resid2 < 1e-9, resid2)
  }

  test("recovers the planted axis, variance, and a converged residual") {
    val c = ScaleQueries.embPcaCovOf(planted, D)
    val (lambda, v, resid, trace) = Pca.dominantOfSymmetric(c, squarings = 12)
    val align = v.indices.map(i => v(i) * u(i)).sum
    assert(math.abs(align) > 0.9999, v.toSeq)     // the planted axis
    assert(align > 0, v.toSeq)                    // svd_flip: largest |loading| positive
    assert(math.abs(lambda - 8.0) < 0.01, lambda) // var of the s grid
    assert(lambda / trace > 0.99, lambda / trace) // low-rank: one axis dominates
    assert(resid < 1e-9, resid)                   // converged
  }
}
