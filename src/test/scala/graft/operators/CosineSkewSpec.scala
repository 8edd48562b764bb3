package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Blocked exact cosine search ([[Similarity.cosineNearDups]]) inherits
  * block-size skew: the self-join shuffles by block key, so one hot
  * block is one hot reducer partition. The engine's answer is AQE skew
  * splitting (same as every keyed join here) — this spec plants a block
  * holding ~90% of the vectors and asserts the REAL operator's join is
  * marked skewed at runtime AND still returns the exact pair set. The
  * conf dance mirrors `AqeSkewSpec` (thresholds shrunk to make a local
  * toy dataset look big); production runs rely on the defaults.
  */
class CosineSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cosineNearDups on a planted hot block: AQE splits it, result stays exact") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // block 0 holds 800 of 900 vectors; 50 cold blocks hold 2 each.
      // Deterministic non-zero vectors (elements vary with position, so
      // norms are strictly positive).
      val vecs = spark.range(0, 900).select(
        col("id"),
        when(col("id") < 800, 0L).otherwise(pmod(col("id"), lit(50)) + 1).as("label"),
        transform(sequence(lit(0), lit(7)),
          i => (pmod(col("id") + i * 3, lit(13)) + 1).cast("float")).as("embedding"))
      val prepped = Similarity.prep(vecs, "id", "embedding")
        .join(vecs.select(col("id"), col("label")), "id")
      // threshold -1: every intra-block pair qualifies, so the expected
      // count is a closed form and the skew split must not lose a pair
      val pairs = Similarity.cosineNearDups(prepped, col("label"), -1.0)
      val expected = 800L * 799 / 2 + 50L * 1
      // collect (not count) so THIS dataset's query execution finalizes —
      // count() spins up its own plan and the skew flag would be invisible
      assert(pairs.collect().length == expected)
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the blocked self-join skewed; plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
