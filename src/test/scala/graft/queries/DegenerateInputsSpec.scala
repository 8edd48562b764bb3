package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Degenerate-input totality for the second-continuation operators —
  * the ab_lift/psi_drift guard discipline: single-token corpora,
  * single-label embeddings, single-source tables, and no-churn streams
  * must yield empty or well-defined frames, never NaN orderings or
  * divide-by-zero throws.
  */
class DegenerateInputsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-degen").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("cond_entropy: a corpus of single-token docs has no bigrams — " +
       "empty frame, no throw") {
    val dir = docsDir(Seq((1L, "one", "en", "s"), (2L, "two", "en", "s")))
    assert(TextQueries.condEntropy(spark, dir).count() == 0L)
  }

  test("chi2_assoc: single lang × single source has dof 0 — χ² = 0 and " +
       "V is NULL, not NaN") {
    val dir = docsDir(Seq((1L, "a", "en", "s"), (2L, "b", "en", "s")))
    val row = ExperimentQueries.chi2Assoc(spark, dir).head()
    assert(row.getLong(3) == 0L)          // dof
    assert(row.getDouble(4) == 0.0)       // chi2
    assert(row.isNullAt(5))               // cramers_v
  }

  test("margin_sample: a single-label embedding table has no second " +
       "centroid — empty frame, no NULL-margin ordering") {
    val dir = java.nio.file.Files.createTempDirectory("graft-degen-e").toString
    Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.5f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(TrainQueries.marginSample(spark, dir).count() == 0L)
  }

  test("mix_waterfill: a single source takes the whole halved budget") {
    // 8 bytes → B = 4, the lone source is unsaturated and absorbs it
    val got = PipelineQueries.mixWaterfill(spark,
      docsDir(Seq((1L, "aaaaaaaa", "en", "only"))))
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(("only", 8L, 4L, 0L)))
  }

  test("survival_km: every user active on the final day → all censored, " +
       "empty curve") {
    val dir = java.nio.file.Files.createTempDirectory("graft-degen-s").toString
    val day = 86400L * 1000000000L
    Seq((1L, 5 * day, 1L, "a"), (2L, 5 * day + 1, 2L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(SignalQueries.survivalKm(spark, dir).count() == 0L)
  }

  test("dedup_edit and dedup_canonical: a one-doc corpus yields no pairs " +
       "and one canonical group") {
    val dir = docsDir(Seq((1L, "lonely document", "en", "s")))
    assert(TextQueries.dedupEdit(spark, dir).count() == 0L)
    assert(TextQueries.dedupCanonical(spark, dir).count() == 1L)
  }

  test("mutual_nn: only reciprocated top-1 pairs survive — the hub's " +
       "unreciprocated admirer is dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mnn").toString
    // v1↔v2 are each other's top-1; v3's top-1 is v2, unreciprocated
    Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0),
        (3L, Seq(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = TrainQueries.mutualNn(spark, dir)
      .as[(Long, Long, Double)].collect().toList
    assert(got.map(p => (p._1, p._2)) == List((1L, 2L)))
  }

  test("dup_cluster_sizes: a planted duplicate pair shows up as one " +
       "2-family among singletons") {
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = docsDir(Seq(
      (1L, dupText, "en", "s"), (2L, dupText, "en", "s"),
      (3L, "entirely unrelated text with other words here", "en", "s")))
    val got = ExtendedQueries.dupClusterSizes(spark, dir)
      .as[(Long, Long)].collect().toList
    assert(got == List((1L, 1L), (2L, 1L)))
  }

  test("emb_pq: both subspace codebooks partition the corpus — 8 cells " +
       "each, member counts sum to n_vecs, affinities in (0, 1]") {
    val dir = "/root/testdata/sf0.001"
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val got = ScaleQueries.embPq(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got.map(_._1).toSet == Set(0L, 1L))
    for (s <- Seq(0L, 1L)) {
      val cells = got.filter(_._1 == s)
      assert(cells.map(_._3).sum == nVecs, s"subspace $s member sum")
      assert(cells.forall(c => c._4 > 0.0 && c._4 <= 1.0), s"subspace $s aff range")
    }
  }

  test("hits_rank: empty purchase graph (no matching orders) → empty " +
       "report, no throw") {
    val dir = java.nio.file.Files.createTempDirectory("graft-degen-h").toString
    Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
      .withColumn("l_quantity", lit(50.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(InsightQueries.hitsRank(spark, dir).count() == 0L)
  }

  test("pass_at_k: every group under the max k — empty frame, no " +
       "undefined-estimator rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-degen-p").toString
    (1L to 9L).map(i => (i, new java.sql.Timestamp(i * 1000), 7L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(ExperimentQueries.passAtK(spark, dir).count() == 0L)
  }

  test("shuffle_audit: a one-doc corpus has zero adjacencies — NULL " +
       "rates, never NaN or a throw") {
    val dir = docsDir(Seq((1L, "only doc", "en", "s")))
    val row = TrainQueries.shuffleAudit(spark, dir).head()
    assert(row.getLong(0) == 1L && row.getLong(1) == 0L) // n_docs, n_pairs
    assert(row.isNullAt(2) && row.isNullAt(4), "same_rate/z must be NULL")
    assert(row.getDouble(3) == 1.0) // expected_rate: one source
  }

  test("unigram trainer: a one-word vocab trains to that word at prob ~1") {
    val m = graft.operators.UnigramLm.train(Map("ab" -> 5L))
    assert(graft.operators.UnigramLm.viterbi("ab", m.logp) == Seq("ab"))
    // 'ab' usage 5, chars floor 1+1 → p(ab) = 5/7; no NaN anywhere
    assert(m.logp.values.forall(v => !v.isNaN && v < 0.0))
  }
}
