package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the product-limit survival curve (hand-computed
  * risk sets with a censored cohort), the water-filling allocator
  * (saturation boundary + exact-budget remainder split), and the
  * interpolated-LM score (single-doc rational mixture pinned).
  */
class SurvivalWaterfillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("survival_km: churn at days 1 and 2 with a censored user gives " +
       "S = 2/3 then 1/3; the censored cohort stays in every risk set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-km").toString
    val day = 86400L * 1000000000L // ns
    // u1 last seen day 1, u2 day 2, u3 day 3 (stream max → censored)
    Seq((1L, 1 * day, 1L, "a"), (2L, 2 * day, 2L, "a"),
        (3L, 1 * day, 3L, "a"), (4L, 3 * day, 3L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SignalQueries.survivalKm(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got == List((1L, 3L, 1L, 0.666667), (2L, 2L, 1L, 0.333333)))
  }

  private def sourcesDir(bytes: Seq[(String, Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-wf").toString
    bytes.zipWithIndex
      .map { case ((src, n), i) => (i.toLong, "a" * n, src) }
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("mix_waterfill: sources below the water level keep everything, " +
       "the rest absorb the remainder; Σ alloc = B exactly") {
    // caps 1,2,9 → B = 6: s1, s2 saturate, s3 gets the remaining 3
    val got = PipelineQueries.mixWaterfill(spark,
        sourcesDir(Seq(("s1", 1), ("s2", 2), ("s3", 9))))
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(("s1", 1L, 1L, 1L), ("s2", 2L, 2L, 1L), ("s3", 9L, 3L, 0L)))
  }

  test("mix_waterfill: the mod-U remainder goes to the FIRST unsaturated " +
       "sources in capacity order, keeping the total exactly B") {
    // caps 1,5,6 → B = 6: s1 saturates; remainder 5 over {5,6} → 3 and 2
    val got = PipelineQueries.mixWaterfill(spark,
        sourcesDir(Seq(("s1", 1), ("s2", 5), ("s3", 6))))
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(("s1", 1L, 1L, 1L), ("s2", 5L, 3L, 0L), ("s3", 6L, 2L, 0L)))
    assert(got.map(_._3).sum == 6L)
  }

  test("dedup_edit: a two-char edit within the same canonical block is " +
       "found with its exact distance; unrelated text is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-edit").toString
    Seq((1L, "the quick brown fox"), (2L, "the quick brown fox x"),
        (3L, "completely different text"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.dedupEdit(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((1L, 2L, 2L)))
  }

  test("langid_confusion: mislabeled docs land on the off-diagonal " +
       "with per-label shares summing to 1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-conf").toString
    Seq((1L, "the and is of", "en"), (2L, "the of and was", "en"),
        (3L, "the of and in", "fr")) // English text wearing a French label
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.langidConfusion(spark, dir)
      .as[(String, String, Long, Double)].collect().toList
    assert(got == List(("en", "en", 2L, 1.0), ("fr", "en", 1L, 1.0)))
  }

  test("dedup_canonical: case/diacritic/punctuation/whitespace variants " +
       "collapse to one keeper; distinct content survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft-canon").toString
    Seq((1L, "Café  Déjà, vu!"), (2L, "cafe deja vu"), (3L, "CAFE-DEJA.VU"),
        (4L, "something else"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.dedupCanonical(spark, dir)
      .select("doc_id", "n_variants")
      .as[(Long, Long)].collect().toList
    assert(got == List((1L, 3L), (4L, 1L)))
  }

  test("skipgram_pairs: ±2 window pairs counted once per direction — " +
       "'a b c' yields (a,b),(b,c),(a,c)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip").toString
    Seq((1L, "a b c"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = RetrievalQueries.skipgramPairs(spark, dir)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 1L)))
  }

  test("mix_waterfill fairness laws hold on randomized capacity vectors: " +
       "Σ alloc = B, alloc ≤ cap, saturated ⇔ full, unsaturated within ±1") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val nSrc = 2 + rnd.nextInt(6)
      val caps = (0 until nSrc).map(i => (f"s$i%02d", 1 + rnd.nextInt(40)))
      val got = PipelineQueries.mixWaterfill(spark, sourcesDir(caps))
        .as[(String, Long, Long, Long)].collect().toList
      val total = caps.map(_._2.toLong).sum
      val b = total / 2
      assert(got.map(_._3).sum == b, s"trial $trial: sum != B")
      assert(got.forall(r => r._3 <= r._2), s"trial $trial: alloc > cap")
      assert(got.forall(r => r._4 == 0L || r._3 == r._2),
        s"trial $trial: saturated source not at capacity")
      val unsat = got.filter(_._4 == 0L).map(_._3)
      if (unsat.nonEmpty)
        assert(unsat.max - unsat.min <= 1, s"trial $trial: unfair split $unsat")
    }
  }

  test("doc_logprob_jm: single-doc rational mixture pinned — " +
       "(7·c_ab·N + 3·c_a·c_b)/(10·c_a·N) = 69/90 on 'x x x'") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jm").toString
    Seq((1L, "x x x"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = RetrievalQueries.docLogprobInterp(spark, dir)
      .as[(Long, Long, Double)].collect().toList
    assert(got == List((1L, 2L, 0.2657)))
  }
}
