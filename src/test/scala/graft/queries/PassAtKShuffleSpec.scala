package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Ground truth for the eval-estimator and shuffle-audit pair: pass@k
  * against an independent exact-combinatorics recompute (BigInt
  * binomials, not the engine's product chain), and the audit's
  * statistics against what a hash order must look like.
  */
class PassAtKShuffleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("pass@k equals exact C(n-c,k)/C(n,k) combinatorics and is monotone in k") {
    def binom(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n) - k + 1 to BigInt(n)).product / (BigInt(1) to BigInt(k)).product
    val rows = ExperimentQueries.passAtK(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c) = (r.getAs[Long]("n_samples"), r.getAs[Long]("n_correct"))
      for (k <- Seq(1, 5, 10)) {
        val exact = 1.0 - (BigDecimal(binom(n - c, k)) / BigDecimal(binom(n, k))).toDouble
        val got = r.getAs[Double](s"pass_at_$k")
        assert(math.abs(got - exact) < 1e-5,
          s"user ${r.get(0)} n=$n c=$c k=$k: $got vs $exact")
      }
      assert(r.getAs[Double]("pass_at_1") <= r.getAs[Double]("pass_at_5") + 1e-9)
      assert(r.getAs[Double]("pass_at_5") <= r.getAs[Double]("pass_at_10") + 1e-9)
    }
  }

  test("shuffle audit: hash order is well mixed, stats internally consistent") {
    val r = TrainQueries.shuffleAudit(spark, dir).collect().head
    val n = r.getAs[Long]("n_docs")
    val m = r.getAs[Long]("n_pairs")
    // 256 blocks drop at most 255 boundary pairs from the n-1 adjacencies
    assert(m <= n - 1 && m >= n - 256, s"n=$n m=$m")
    val p = r.getAs[Double]("expected_rate")
    // independent sum-p^2 recompute
    val cnts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").count().collect().map(_.getLong(1))
    val want = cnts.map(c => c.toDouble * c).sum / math.pow(cnts.sum.toDouble, 2)
    assert(math.abs(p - want) < 1e-5)
    // an md5 permutation must NOT alert: |z| comfortably sub-alert
    assert(math.abs(r.getAs[Double]("z")) < 4.0,
      s"hash order flagged as unmixed: z=${r.getAs[Double]("z")}")
  }
}
