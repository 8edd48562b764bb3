package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The tolerance-oracle recall queries reduce the Spark-hash-specific
  * ANN / MinHash paths to (exact count, deterministic flag) rows. Probes
  * at sf0.001/sf0.01 measured LSH 62/74%, IVF 68/50%, MinHash 100/100%
  * against thresholds 35/25/50 — wide margins, and every input
  * (xxhash64 planes, seed-fixed k-means) is deterministic, so the flag
  * is a constant at a given SF, not a distribution.
  */
class RecallQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("knn_lsh_recall: single row, exact brute count, flag up") {
    val r = ScaleQueries.knnLshRecall(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_brute") == 50L)
    assert(r(0).getAs[Long]("recall_ok") == 1L)
  }

  test("knn_ivf_recall: single row, flag up") {
    val r = ScaleQueries.knnIvfRecall(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("recall_ok") == 1L)
  }

  test("minhash_recall: truth count matches the sparse-join oracle shape, flag up") {
    val r = ScaleQueries.minhashRecall(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_true") > 0L)
    assert(r(0).getAs[Long]("recall_ok") == 1L)
  }

  test("simhash_recall: same truth set as minhash_recall, flag up") {
    val sim = ScaleQueries.simhashRecall(spark, dir).collect()
    val min = ScaleQueries.minhashRecall(spark, dir).collect()
    assert(sim.length == 1)
    assert(sim(0).getAs[Long]("n_true") == min(0).getAs[Long]("n_true"))
    assert(sim(0).getAs[Long]("recall_ok") == 1L)
  }

  test("simhash_precision: same exact truth count, flag up (measured " +
       "77.8/88.2/36.0% at the three SFs vs floor 25)") {
    val p = ScaleQueries.simhashPrecision(spark, dir).collect()
    val min = ScaleQueries.minhashRecall(spark, dir).collect()
    assert(p.length == 1)
    assert(p(0).getAs[Long]("n_true") == min(0).getAs[Long]("n_true"))
    assert(p(0).getAs[Long]("precision_ok") == 1L)
  }
}
