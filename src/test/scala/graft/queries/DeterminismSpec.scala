package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The cluster-stability claim, tested directly: results must be
  * byte-identical under different partition counts (different partial-
  * aggregation and merge orders — what a real cluster does between any
  * two runs). This is what the exact-decimal aggregation path, struct
  * argmax, and explicit tiebreaks exist for.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  // float-aggregating, window-ranking, and sketch-free representative mix
  private val picks = Seq(
    "q1_pricing_summary", "stats_moments", "weighted_mean", "agg_salted",
    "window_topk", "latest_snapshot", "dup_clusters", "curation_funnel",
    // TPC-H batch: double-equality on an aggregate (q15), conditional
    // ratio (q8), and a float-heavy 6-way join (q7) — the shapes where
    // partial-agg order would show first
    "q7_volume_shipping", "q8_market_share", "q15_top_supplier")

  test("results are identical at 3 and 17 shuffle partitions") {
    for (name <- picks) {
      def run(parts: String): Seq[String] = {
        val old = spark.conf.get("spark.sql.shuffle.partitions")
        try {
          spark.conf.set("spark.sql.shuffle.partitions", parts)
          SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
        } finally spark.conf.set("spark.sql.shuffle.partitions", old)
      }
      val a = run("3")
      val b = run("17")
      assert(a == b, s"$name diverged between partition counts")
    }
  }
}
