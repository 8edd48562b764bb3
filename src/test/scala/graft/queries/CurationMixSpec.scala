package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the curation-mix continuation operators:
  * conditional entropy collapses to 0 on a deterministic-next-word
  * source (while token entropy stays high), temperature scaling
  * up-boosts tail sources by exactly p^(α−1) at α = 1/2, and the
  * serpentine shard deal balances an arithmetic byte ladder perfectly.
  */
class CurationMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plantedDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-curmix").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("cond_entropy: deterministic next-word gives h_cond = 0 with " +
       "h_token > 0; a branching source sits strictly between") {
    // det: x→y always, y→x always (every transition is forced)
    // mix: from x the next word branches (y or z)
    val dir = plantedDir(Seq(
      (1L, "x y x y x y", "det"),
      (2L, "x y x z", "mix")))
    val got = TextQueries.condEntropy(spark, dir)
      .select("source", "n_bigrams", "vocab_a", "h_token", "h_cond")
      .as[(String, Long, Long, Double, Double)].collect().toList
    assert(got == List(
      ("det", 5L, 2L, 0.673012, 0.0),
      ("mix", 3L, 2L, 0.636514, 0.462098)))
  }

  test("mix_temperature: α = 1/2 boosts sources by exactly √(N/n) — " +
       "3.0 / 1.5 / 0.75 on a 1:4:16 corpus") {
    val docs =
      (1 to 1).map(i => (i.toLong, "a", "s_tail")) ++
      (2 to 5).map(i => (i.toLong, "a", "s_mid")) ++
      (6 to 21).map(i => (i.toLong, "a", "s_head"))
    val got = PipelineQueries.mixTemperature(spark, plantedDir(docs))
      .select("source", "n_docs", "p", "q_t05", "q_t025", "boost_t05")
      .as[(String, Long, Double, Double, Double, Double)].collect().toList
    assert(got == List(
      ("s_head", 16L, 0.761905, 0.571429, 0.453082, 0.75),
      ("s_mid", 4L, 0.190476, 0.285714, 0.320377, 1.5),
      ("s_tail", 1L, 0.047619, 0.142857, 0.226541, 3.0)))
    // flattening: the α = 1/4 mix is strictly flatter than α = 1/2
    val q25 = got.map(_._5)
    val q05 = got.map(_._4)
    assert(q25.max - q25.min < q05.max - q05.min)
  }

  test("shard_plan: the serpentine deal packs a 16..1 byte ladder into " +
       "8 perfectly equal shards (each 17 bytes, share 0.125)") {
    // doc i has n_chars = i (text of i chars); ranked desc the ladder is
    // 16..1; pass 0 deals 16..9 to shards 0..7, pass 1 deals 8..1 back
    // 7..0 — every shard gets (17 − k) + k = 17 bytes
    val dir = plantedDir((1 to 16).map(i => (i.toLong, "a" * i, "s")))
    val got = PipelineQueries.shardPlan(spark, dir)
      .select("shard", "n_docs", "bytes", "share")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got == (0 to 7).map(s => (s.toLong, 2L, 17L, 0.125)).toList)
  }
}
