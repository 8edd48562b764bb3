package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the bloom-prefiltered decontamination audit (the
  * no-false-negative law on a planted contaminated pair) and for
  * margin sampling (hand-computed two-label geometry: the off-axis
  * vector is the most ambiguous, margins and labels pinned exactly).
  */
class BloomMarginSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom_prefilter: planted eval/train gram overlap — exact count " +
       "right, bloom is a superset, fp excess within bound") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val shared = "q w e r t" // one 5-gram, shared eval ↔ train doc 1
    Seq(
      (97L, shared + " evaltail"),
      (1L, shared + " traintail"),
      (2L, "a b c d e f g h"),
      (3L, "z x c v b n m k"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // n_tg = train 5-gram probes: doc 1 has 6 tokens (2 grams), docs 2-3
    // have 8 tokens (4 grams each) → 10
    val got = PipelineQueries.bloomPrefilter(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(got == List((3L, 10L, 1L, 1L, 1L))) // n_train, n_tg, n_exact, superset_ok, fp_ok
  }

  test("margin_sample: two-label geometry — the off-axis member is the " +
       "most ambiguous; margins, labels, and order pinned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-margin").toString
    // label 0 = {(1,0), (1,0), (1,1)} → centroid (1, 1/3)
    // label 1 = {(0,1), (0,1)}       → centroid (0, 1)
    Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.0f, 1.0f), 1),
      (5L, Seq(1.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = TrainQueries.marginSample(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got == List(
      (5L, 0L, 1L, 0.18732),
      (3L, 1L, 0L, 0.683772), (4L, 1L, 0L, 0.683772),
      (1L, 0L, 1L, 0.948683), (2L, 0L, 1L, 0.948683)))
  }
}
