package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Ground-truth checks for the whitening + JL audit family, on the
  * real sf0.001 fixture (the registered queries' oracles prove
  * cross-engine replay; this spec proves the MATH — the certificate
  * values are what whitening/JL theory says they must be, and the
  * projections agree with independent driver-side recomputes).
  */
class EmbWhitenJlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("whitening certificate: unit variances, zero covariance, positive-zero sign") {
    val row = ScaleQueries.embWhitenCheck(spark, dir).collect().head
    assert(row.getAs[Long]("n_vecs") > 0)
    assert(row.getAs[Double]("var_w1") === 1.0)
    assert(row.getAs[Double]("var_w2") === 1.0)
    val cov = row.getAs[Double]("cov_w12")
    assert(cov === 0.0)
    // the certificate's one knife-edge is the SIGN of a ~1e-17 zero:
    // the +0.0 normalization must make it the canonical positive zero
    assert(java.lang.Double.doubleToRawLongBits(cov) == 0L,
      "cov_w12 must be +0.0, not -0.0")
  }

  test("whitened coords are the pca-map coords rescaled by one constant per axis") {
    val m = ScaleQueries.embPcaMap(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val w = ScaleQueries.embWhiten(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m.keySet == w.keySet)
    // recover the per-axis scale from the largest-|coord| vector (best
    // relative precision against the round-6 quantization of both
    // frames), then check EVERY vector agrees under that single scale
    val ref = m.maxBy { case (_, (a, _)) => math.abs(a) }._1
    val s1 = w(ref)._1 / m(ref)._1
    val ref2 = m.maxBy { case (_, (_, b)) => math.abs(b) }._1
    val s2 = w(ref2)._2 / m(ref2)._2
    assert(s1 > 1.0 && s2 > 1.0, s"1/sqrt(lambda) scales expected > 1, got $s1 $s2")
    m.foreach { case (id, (a, b)) =>
      assert(math.abs(w(id)._1 - a * s1) < 2e-5, s"w1 mismatch at $id")
      assert(math.abs(w(id)._2 - b * s2) < 2e-5, s"w2 mismatch at $id")
    }
  }

  test("jl projection agrees with an independent driver-side R multiply") {
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .orderBy("vec_id").limit(5).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // rebuild R independently (same public derivation, separate code)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val hex = md.digest(s"jl_${i}_$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (if (Character.digit(hex.charAt(0), 16) % 2 == 0) 1.0 else -1.0) / 4.0
    }
    val got = ScaleQueries.embJlProject(spark, dir)
      .filter(col("vec_id") < 5).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val x = raw(r.getLong(0))
      for (j <- 1 to 16) {
        val want = (1 to 64).map(i => sign(i, j) * x(i - 1)).sum
        assert(math.abs(r.getDouble(j) - want) < 1e-5,
          s"y$j of vec ${r.getLong(0)}: ${r.getDouble(j)} vs $want")
      }
    }
  }

  test("jl distortion certificate: linear pair count, unbiased ratio, honest band") {
    val row = ScaleQueries.embJlCheck(spark, dir).collect().head
    val n = row.getAs[Long]("n_pairs")
    // 500 vectors, 1-in-4 sample, <=1 pair each minus bucket boundaries
    assert(n > 80 && n < 130, s"pair count $n outside the linear-audit range")
    assert(math.abs(row.getAs[Double]("mean_ratio") - 1.0) < 0.2,
      "E[ratio] = 1 is the JL unbiasedness property")
    assert(row.getAs[Double]("min_ratio") > 0.0)
    assert(row.getAs[Double]("max_ratio") < 4.0)
    val ib = row.getAs[Double]("inband_frac")
    assert(ib > 0.7 && ib < 1.0,
      s"inband $ib: k=16 must land most but not all pairs in the ±0.5 band")
  }
}
