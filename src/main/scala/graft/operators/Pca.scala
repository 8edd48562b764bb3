package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dominant direction of the between-label scatter matrix — the
  * "drift axis" diagnostic of a labeled/sourced corpus: the single
  * embedding direction along which the group centroids separate most
  * (label ≈ source/domain in a curation pipeline; a large top
  * eigenvalue share says one axis explains most inter-group drift,
  * e.g. one source shifted).
  *
  * Why not plain PCA power iteration: the corpus covariance here is
  * near-isotropic (measured λ2/λ1 ≈ 0.95–0.99 at every SF), so vanilla
  * power iteration needs hundreds of corpus passes to converge. The
  * between-label scatter B = Σ_l w_l (c_l−μ)(c_l−μ)ᵀ instead has rank
  * ≤ L−1 (L = label count), and its nonzero spectrum lives in the
  * L×L matrix A = W^½ D Dᵀ W^½ (D = centered centroids) — so the ONLY
  * corpus-sized work is ONE label-keyed aggregation (L·d avg's,
  * map-side combinable, one exchange of L rows) and everything after
  * is model-sized driver math: power-by-SQUARING on A (each squaring
  * doubles the effective power; 7 squarings = A^128, convergence
  * factor (λ2/λ1)^128 ≈ 1e-13 at the measured λ2/λ1 ≈ 0.81), each
  * squaring Frobenius-normalized so the entries never over/underflow.
  *
  * Determinism: fixed squaring count, max-diagonal-column init (see
  * [[dominantDirection]]), pure double math —
  * the whole recurrence replays as long-form SQL (centroid join →
  * L²-row matrix frames → squaring joins), which is how the
  * `label_scatter_pc1` / `label_scatter_power` oracles are generated.
  * Sign fixed by svd_flip's rule (first coordinate attaining max
  * |loading| made positive); measured margins: max |loading| ≥ 0.31
  * and argmax gap ≥ 0.04 across SFs, far above the ~1e-11 cross-engine
  * fp divergence (ΔA/gap(A)), so engines cannot disagree.
  */
object Pca {

  /** Result of the one corpus pass: label values (ascending), weights
    * w_l = n_l/N, the CENTERED centroid matrix D (L×d, rows in label
    * order), and the grand mean μ — all model-sized.
    */
  final case class Scatter(labels: Array[Int], w: Array[Double],
                           dMat: Array[Array[Double]], mu: Array[Double])

  /** One corpus pass for the d-dim array column `vecCol`: one
    * label-keyed aggregation (L·d avgs + counts, map-side combinable,
    * one exchange of L rows). μ is folded on the driver as Σ w_l c_l
    * (exactly the weighted centroid mean, so no second corpus pass),
    * in ascending-label order on both engines.
    */
  def labelScatter(e: DataFrame, vecCol: String, d: Int): Scatter = {
    val dims = 1 to d
    val aggs = count(lit(1)).cast("double").as("n") +:
      dims.map(i => avg(element_at(col(vecCol), i).cast("double")).as(s"c$i"))
    val rows = e.groupBy("label").agg(aggs.head, aggs.tail: _*)
      .orderBy("label").collect()
    val labels = rows.map(_.getInt(0))
    val total = rows.map(_.getDouble(1)).sum
    val w = rows.map(_.getDouble(1) / total)
    val cents = rows.map(r => dims.map(i => r.getDouble(1 + i)).toArray)
    val mu = Array.tabulate(d)(i => w.indices.map(l => w(l) * cents(l)(i)).sum)
    val dMat = cents.map(c => Array.tabulate(d)(i => c(i) - mu(i)))
    Scatter(labels, w, dMat, mu)
  }

  /** Driver-side solve: (λ₁, v, resid, trace(B)) of the between-label
    * scatter from (w, D). `squarings` normalized squarings of
    * A = W^½DDᵀW^½, then u = the normalized COLUMN of A^(2^k) with the
    * largest diagonal entry (first index on ties), lifted to
    * v = normalize(Dᵀ W^½ u), sign-fixed. The column init, not a fixed
    * vector: in the squared-power limit M ≈ u₁u₁ᵀ, so the max-diagonal
    * column IS the eigenvector (scaled by u₁(k) with |u₁(k)| ≥ 1/√L,
    * never zero) — a fixed init vector can be exactly orthogonal to u₁
    * (PcaSpec's symmetric plant has M·1 = 0) and NaNs out. A
    * column-choice flip between near-tied diagonals only flips the
    * SIGN of u, which the final svd_flip heals. resid = ‖Bv − λv‖/λ
    * is the convergence certificate the registered query emits.
    */
  def dominantDirection(w: Array[Double], dMat: Array[Array[Double]],
                        squarings: Int): (Double, Array[Double], Double, Double) = {
    val L = w.length
    val d = dMat(0).length
    val sw = w.map(math.sqrt)
    var a = Array.tabulate(L, L)((l, m) =>
      sw(l) * sw(m) * dot(dMat(l), dMat(m)))
    for (_ <- 1 to squarings) {
      val sq = Array.tabulate(L, L)((l, m) =>
        (0 until L).map(k => a(l)(k) * a(k)(m)).sum)
      val fro = math.sqrt(sq.flatten.map(x => x * x).sum)
      a = sq.map(_.map(_ / fro))
    }
    val diag = Array.tabulate(L)(l => a(l)(l))
    val k = diag.indexOf(diag.max)
    val u0 = a.map(_(k)) // max-diagonal column of A^(2^squarings)
    val un = math.sqrt(u0.map(x => x * x).sum)
    val u = u0.map(_ / un)
    val v0 = Array.tabulate(d)(i => (0 until L).map(l => sw(l) * u(l) * dMat(l)(i)).sum)
    val vn = math.sqrt(v0.map(x => x * x).sum)
    var v = v0.map(_ / vn)
    val mx = v.map(math.abs).max
    if (v(v.map(math.abs).indexOf(mx)) < 0) v = v.map(-_)
    // λ = vᵀBv via per-label projections; Bv for the residual
    val proj = (0 until L).map(l => dot(dMat(l), v))
    val lambda = (0 until L).map(l => w(l) * proj(l) * proj(l)).sum
    val bv = Array.tabulate(d)(i => (0 until L).map(l => w(l) * proj(l) * dMat(l)(i)).sum)
    val resid = math.sqrt(bv.indices.map(i => sq2(bv(i) - lambda * v(i))).sum) / lambda
    val trace = (0 until L).map(l => w(l) * dot(dMat(l), dMat(l))).sum
    (lambda, v, resid, trace)
  }

  /** Driver-side dominant direction of an EXPLICIT symmetric PSD
    * matrix — the corpus-covariance sibling of [[dominantDirection]]
    * (which works in the L×L label space and lifts): same
    * Frobenius-normalized power-by-squaring, same max-diagonal-column
    * init, same svd_flip sign rule, but the eigenvector is read
    * directly off the converged matrix (no lift). Used by `emb_pca`,
    * where A is the d×d corpus covariance: the corpus covariance here
    * is near-isotropic (λ2/λ1 ≈ 0.93–0.99 measured at every SF), so
    * squarings are the only convergent power scheme — 12 squarings =
    * A^4096, factor (0.99)^4096 ≈ 1e-18; measured resid ≈ 3e-16 at
    * every SF, with diag-argmax gap ≥ 4.6e-3 and sign-rule margin
    * ≥ 7.7e-3, both ≥ 10¹⁰× the measured summation-order fp
    * divergence (~1e-16), so engines cannot disagree.
    * Returns (λ₁, v, resid = ‖Av−λv‖/λ, trace(A)).
    */
  def dominantOfSymmetric(a0: Array[Array[Double]], squarings: Int)
      : (Double, Array[Double], Double, Double) = {
    val d = a0.length
    var a = a0.map(_.clone())
    for (_ <- 1 to squarings) {
      val sq = Array.tabulate(d, d)((l, m) =>
        (0 until d).map(k => a(l)(k) * a(k)(m)).sum)
      val fro = math.sqrt(sq.flatten.map(x => x * x).sum)
      a = sq.map(_.map(_ / fro))
    }
    val diag = Array.tabulate(d)(l => a(l)(l))
    val k = diag.indexOf(diag.max)
    val v0 = a.map(_(k)) // max-diagonal column of A^(2^squarings)
    val vn = math.sqrt(v0.map(x => x * x).sum)
    var v = v0.map(_ / vn)
    val mx = v.map(math.abs).max
    if (v(v.map(math.abs).indexOf(mx)) < 0) v = v.map(-_)
    val av = Array.tabulate(d)(i => dot(a0(i), v))
    val lambda = dot(v, av)
    val resid = math.sqrt(av.indices.map(i => sq2(av(i) - lambda * v(i))).sum) / lambda
    val trace = (0 until d).map(i => a0(i)(i)).sum
    (lambda, v, resid, trace)
  }

  /** FULL eigendecomposition of a symmetric matrix by cyclic Jacobi —
    * the driver-side solve completing the rank-1/rank-2 machinery
    * above for full-rank whitening/ZCA: fixed row-cyclic sweeps of 2×2
    * rotations, each zeroing one off-diagonal entry exactly
    * (quadratically convergent; `sweeps` fixed for determinism — 12
    * sweeps on the 64×64 corpus covariance leaves off-diagonal
    * Frobenius mass ≤ 1e-14·‖A‖, returned as the convergence
    * certificate). Model-sized: O(sweeps·d³) driver flops, nothing
    * touches the corpus. Returns eigenvalues DESCENDING (ties broken
    * by original column index), eigenvectors as COLUMNS of the second
    * array (`vecs(i)(k)` = component i of eigenvector k), each
    * sign-fixed by svd_flip's rule like [[dominantOfSymmetric]].
    */
  def jacobiEigen(a0: Array[Array[Double]], sweeps: Int)
      : (Array[Double], Array[Array[Double]], Double) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to sweeps; p <- 0 until d - 1; q <- p + 1 until d) {
      val apq = a(p)(q)
      if (apq != 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t =
          if (theta >= 0.0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        // rotate rows/cols p and q of A (symmetric update)
        var k = 0
        while (k < d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
          k += 1
        }
        k = 0
        while (k < d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
          k += 1
        }
        // accumulate the rotation into V
        k = 0
        while (k < d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
          k += 1
        }
      }
    }
    val offFro = math.sqrt(
      (for (i <- 0 until d; j <- 0 until d if i != j) yield sq2(a(i)(j))).sum)
    val order = (0 until d).sortBy(k => (-a(k)(k), k))
    val ev = order.map(k => a(k)(k)).toArray
    val vecs = Array.tabulate(d, d) { (i, kk) =>
      val k = order(kk)
      v(i)(k)
    }
    // svd_flip per eigenvector: the max-|component| entry made positive
    for (k <- 0 until d) {
      val colK = (0 until d).map(i => vecs(i)(k))
      val mx = colK.map(math.abs).max
      if (colK(colK.map(math.abs).indexOf(mx)) < 0)
        for (i <- 0 until d) vecs(i)(k) = -vecs(i)(k)
    }
    (ev, vecs, offFro)
  }

  /** ZCA whitening matrix W = V diag(1/√max(λ, floor)) Vᵀ from a full
    * [[jacobiEigen]] solve — symmetric, so y = W(x−μ) is the unique
    * whitening closest to the identity (the "keep the data looking
    * like itself" choice). The floor guards rank-deficient covariance
    * (a zero eigenvalue direction carries no variance to whiten).
    */
  def zcaWhitenMatrix(ev: Array[Double], vecs: Array[Array[Double]],
      floor: Double): Array[Array[Double]] = {
    val d = ev.length
    val inv = ev.map(l => 1.0 / math.sqrt(math.max(l, floor)))
    Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => vecs(i)(k) * inv(k) * vecs(j)(k)).sum)
  }

  private def sq2(x: Double): Double = x * x
  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.lazyZip(b).map(_ * _).sum
}
