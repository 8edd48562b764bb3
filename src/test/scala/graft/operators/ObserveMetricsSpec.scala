package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Batch observability: `observe()` rides health counters on the
  * existing action — rows seen, rows dropped, drop reasons — computed
  * inside the same pass over the data. At 100 TB this is the difference
  * between "the curation job also reports its funnel" and "a second
  * full scan to count what happened" (the batch analog of the
  * streaming progress listener in ProgressListenerSpec).
  */
class ObserveMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("curation filter reports its funnel in the same pass") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val total = docs.count()
    val shortDirect = docs.filter(col("n_chars") < 200).count()

    val obs = Observation("curation")
    val kept = docs
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("dropped_short"))
      .filter(col("n_chars") >= 200)
      .count()

    val m = obs.get
    assert(m("rows_seen") == total)
    assert(m("dropped_short") == shortDirect)
    assert(kept == total - shortDirect)
  }

  test("observed metrics see pre-filter rows even when the action keeps none") {
    // the filter must be data-dependent: a literal `false` constant-folds
    // the whole subtree (observe node included) into an empty relation
    // and the metric never fires — correct optimizer behavior worth
    // pinning here as a usage caveat
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val obs = Observation("empty_out")
    val kept = docs
      .observe(obs, count(lit(1)).as("rows_seen"))
      .filter(col("n_chars") < -1)
      .count()
    assert(kept == 0L)
    assert(obs.get("rows_seen") == docs.count())
  }
}
