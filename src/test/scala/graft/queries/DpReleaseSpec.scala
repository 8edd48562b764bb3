package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Mechanism checks for the DP histogram release: the registered
  * oracle proves cross-engine replay; this spec proves the NOISE is
  * what the Laplace mechanism requires — correct inverse-CDF values,
  * the Laplace(1/ε) scale empirically, deterministic replay, and
  * valid post-processing.
  */
class DpReleaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = WarehouseQueries.dpRelease(spark, dir).collect()

  private lazy val truth: Map[(String, String), Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang", "source").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("per-cell noise matches an independent inverse-CDF Laplace recompute") {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val hex = md.digest(s"dp_${key._1}_${key._2}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.take(8), 16).toDouble + 0.5) / 4294967296.0
      val noise = -math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val want = truth(key) + noise
      assert(math.abs(r.getAs[Double]("noisy_count") - want) < 1e-4,
        s"cell $key: ${r.getAs[Double]("noisy_count")} vs $want")
    }
  }

  test("noise is Laplace(1)-scaled: E|noise| near 1, both signs present") {
    val noises = rows.map { r =>
      r.getAs[Double]("noisy_count") - truth((r.getString(0), r.getString(1)))
    }
    val meanAbs = noises.map(math.abs).sum / noises.length
    assert(meanAbs > 0.5 && meanAbs < 1.6,
      s"E|Laplace(1)| = 1; got $meanAbs over ${noises.length} cells")
    assert(noises.count(_ > 0) > 0 && noises.count(_ < 0) > 0,
      "a one-signed noise column is not a centered mechanism")
  }

  test("released is valid post-processing: nonnegative rounding of noisy") {
    rows.foreach { r =>
      val rel = r.getAs[Long]("released")
      assert(rel >= 0)
      assert(rel == math.max(0L, math.rint(r.getAs[Double]("noisy_count")).toLong),
        s"released must be the clamped integer rounding for ${(r.getString(0), r.getString(1))}")
      assert(r.getAs[Double]("epsilon") == 1.0)
    }
  }

  test("the release replays bit-identically (seeded, no RNG state)") {
    val again = WarehouseQueries.dpRelease(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("dp mean: clipped-sum/count composition matches an independent recompute") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def lap(tag: String, key: String, b: Double): Double = {
      val hex = md.digest(s"${tag}_$key".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.take(8), 16).toDouble + 0.5) / 4294967296.0
      -b * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
    }
    val cells = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").agg(count(lit(1)).as("n"),
        sum(least(col("n_chars"), lit(1000L))).as("s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = WarehouseQueries.dpMeanRelease(spark, dir).collect()
    assert(got.length == cells.size)
    got.foreach { r =>
      val src = r.getString(0)
      val (n, s) = cells(src)
      val nc = n + lap("dpc", src, 2.0)
      val mean = (s + lap("dps", src, 2000.0)) / math.max(nc, 1.0)
      assert(math.abs(r.getAs[Double]("noisy_count") - nc) < 1e-3, s"$src count")
      assert(math.abs(r.getAs[Double]("released_mean") - mean) < 1e-3, s"$src mean")
      // the published uncertainty must be the b/count scale, not decoration
      assert(math.abs(r.getAs[Double]("mean_noise_scale") - 2000.0 / math.max(nc, 1.0)) < 1e-3)
      assert(r.getAs[Double]("clip") == 1000.0)
    }
  }

  test("dp topk: Gumbel-max selection matches an independent recompute; true counts stay private") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(tag: String, key: String): Double = {
      val hex = md.digest(s"${tag}_$key".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(8), 16).toDouble + 0.5) / 4294967296.0
    }
    // the counted quantity is CLIPPED DOCUMENT FREQUENCY (doc-level
    // adjacency): each doc contributes each word once, <= 32 words
    // (its in-doc most frequent, ties by word asc)
    val wc = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).toSeq
      .flatMap { case (_, rows) =>
        rows.groupBy(_._2).view.mapValues(_.size).toSeq
          .sortBy { case (w, tf) => (-tf, w) }.take(32).map(_._1)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // k=10 selections of eps/2k = 0.05 each: score = 0.025*c + Gumbel
    val want = wc.toSeq
      .map { case (w, c) => (0.025 * c + -math.log(-math.log(u("dpt", w))), w) }
      .sortBy { case (s, w) => (-s, w) }.take(10).map(_._2)
    val got = WarehouseQueries.dpTopk(spark, dir).collect()
    assert(got.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    assert(got.map(_.getString(1)).toSeq == want, "selection must be the Gumbel-max set, in order")
    got.foreach { r =>
      val w = r.getString(1)
      // laplace on the released counts: L1 sens min(32,10)=10 at eps/2
      val noise = -20.0 * math.signum(u("dptc", w) - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u("dptc", w) - 0.5))
      assert(math.abs(r.getAs[Double]("noisy_count") - (wc(w) + noise)) < 1e-3)
      // the exact count never appears: Laplace noise is a.s. non-integer
      assert(r.getAs[Double]("noisy_count") != wc(w).toDouble)
    }
  }

  test("secret salt: different release, identical shape and accounting") {
    val unsalted = WarehouseQueries.dpReleaseSalted(spark, dir, "")
    val salted = WarehouseQueries.dpReleaseSalted(spark, dir, "prod-secret-1")
    val a = unsalted.collect()
    val b = salted.collect()
    // same cells released, same schema — the accounting surface
    // (dp_budget counts cells and eps, never noise values) is
    // salt-independent by construction
    assert(a.map(r => (r.getString(0), r.getString(1))).toSeq ==
      b.map(r => (r.getString(0), r.getString(1))).toSeq)
    assert(a.map(_.getAs[Double]("epsilon")).toSeq ==
      b.map(_.getAs[Double]("epsilon")).toSeq)
    // but the draws differ: an adversary without the salt cannot
    // reconstruct the noise
    val movedCells = a.zip(b).count { case (x, y) =>
      x.getAs[Double]("noisy_count") != y.getAs[Double]("noisy_count") }
    assert(movedCells > 0, "salted release must change the draws")
    // empty salt reproduces the registered release exactly
    val again = WarehouseQueries.dpRelease(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // the other salted mechanisms run and keep their shapes
    assert(WarehouseQueries.dpMeanReleaseSalted(spark, dir, "s").count() ==
      WarehouseQueries.dpMeanRelease(spark, dir).count())
    assert(WarehouseQueries.dpQuantileSalted(spark, dir, "s").count() == 1)
    assert(WarehouseQueries.dpTopkSalted(spark, dir, "s").count() == 10)
  }

  test("dp_quantile: per-release nonce re-keys the count noise") {
    // Round-14 advisor fix: with a fixed salt and no nonce, every
    // release draws the IDENTICAL Laplace count noise — differencing
    // two releases over neighboring corpora reveals the exact count
    // delta. Keying the seed per release restores the protection.
    val r1 = WarehouseQueries.dpQuantileSalted(spark, dir, "s", "epoch-1").collect()(0)
    val r2 = WarehouseQueries.dpQuantileSalted(spark, dir, "s", "epoch-2").collect()(0)
    assert(r1.getAs[Double]("noisy_n_docs") != r2.getAs[Double]("noisy_n_docs"),
      "distinct nonces must draw distinct count noise")
    // empty nonce reproduces the registered oracle-parity release
    val reg = WarehouseQueries.dpQuantile(spark, dir).collect()(0)
    val empty = WarehouseQueries.dpQuantileSalted(spark, dir, "", "").collect()(0)
    assert(reg.toSeq == empty.toSeq)
  }
}
