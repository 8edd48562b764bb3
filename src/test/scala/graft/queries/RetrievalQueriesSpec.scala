package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantics of the retrieval-stack operators: BM25 ordering laws,
  * candidate-list RRF, unigram-LM scoring, DSIR target tilt, and PMI
  * collocation ranking — all on planted corpora with hand-derivable
  * ground truth.
  */
class RetrievalQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (doc_id, text, lang) → temp dir holding documents.parquet; a
    * matching embeddings.parquet is planted when `embs` is given.
    */
  private def plantedDir(rows: Seq[(Long, String, String)],
                         embs: Seq[(Long, Seq[Float])] = Nil): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-retrieval").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    if (embs.nonEmpty)
      embs.toDF("vec_id", "embedding").withColumn("label", lit(0))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("bm25: more query-term occurrences at equal length ranks higher; " +
       "longer doc with the same tf ranks lower") {
    val pad = (1 to 10).map(i => s"p$i").mkString(" ")
    val dir = plantedDir(Seq(
      (1L, s"vector vector vector $pad", "en"),
      (2L, s"vector p0 p0 $pad", "en"),
      (3L, s"vector p0 p0 $pad $pad", "en"), // same tf as 2, longer doc
      (4L, pad, "en")))
    val out = RetrievalQueries
      .bm25(spark.read.parquet(s"$dir/documents.parquet"),
        Seq("vector"), topK = 10)
      .select("doc_id", "raw").as[(Long, Double)].collect().toMap
    assert(!out.contains(4L))                     // no query term → no row
    assert(out(1L) > out(2L))                     // higher tf wins
    assert(out(2L) > out(3L))                     // length normalization
  }

  test("bm25: the rarer of two equally-frequent-in-doc terms contributes more") {
    // 'rare' appears in 1 doc, 'common' in all 4 → idf(rare) > idf(common)
    val dir = plantedDir(Seq(
      (1L, "rare x1 x2 x3", "en"),
      (2L, "common y1 y2 y3", "en"),
      (3L, "common z1 z2 z3", "en"),
      (4L, "common w1 w2 w3", "en")))
    val out = RetrievalQueries
      .bm25(spark.read.parquet(s"$dir/documents.parquet"),
        Seq("rare", "common"), topK = 10)
      .select("doc_id", "raw").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))
  }

  test("rrf_fusion: two mid ranks beat one top rank plus a list-B miss; " +
       "ranks join doc=vec and score is 1/(60+ra)+1/(60+rb)") {
    // doc 1: 2nd-longest text AND 2nd-closest embedding to the query (vec 0)
    // doc 2: longest text, NO embedding row → absent from list B entirely
    // doc 3: shortest text, closest embedding
    val e = Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 3L -> Seq(1f, 0.01f))
    val dir = plantedDir(Seq(
      (1L, (1 to 50).map(_ => "a").mkString(" "), "en"),
      (2L, (1 to 80).map(_ => "b").mkString(" "), "en"),
      (3L, "short", "en"),
      (0L, (1 to 20).map(_ => "q").mkString(" "), "en")), e)
    val rows = RetrievalQueries.rrfFusion(spark, dir)
      .select("doc_id", "ra", "rb", "rrf")
      .as[(Long, java.lang.Long, java.lang.Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, ra1, rb1, rrf1) = rows(1L)
    assert(ra1 == 2L && rb1 == 2L) // 2nd by length, 2nd by cosine (after 3)
    assert(math.abs(rrf1 - (1.0 / 62 + 1.0 / 62)) < 1e-6) // rrf is round(·, 6)
    assert(rows(2L)._3 == null) // no embedding → no list-B rank
    assert(rrf1 > rows(2L)._4 && rrf1 > rows(3L)._4)
  }

  test("doc_logprob: a doc of corpus-common tokens scores lower nll than " +
       "a doc of hapaxes, and nll ≈ hand-computed value") {
    val common = (1 to 8).map(_ => "the").mkString(" ")
    val dir = plantedDir(Seq(
      (1L, common, "en"),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8", "en")))
    val out = RetrievalQueries.docLogprob(spark, dir)
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    assert(out(1L) < out(2L))
    // T=16 tokens; doc 1 tokens all have corpus count 8 → nll = ln(16/8)
    assert(math.abs(out(1L) - math.log(2.0)) < 1e-3)
    // doc 2 tokens are hapaxes → nll = ln(16/1)
    assert(math.abs(out(2L) - math.log(16.0)) < 1e-3)
  }

  test("doc_logprob2: a common-order doc scores lower than the same words " +
       "in rare order, both at hand-computed values") {
    // corpus: 'a b' ×2 and 'b a' ×1 → c(a)=c(b)=3, c(a,b)=2, c(b,a)=1
    val dir = plantedDir(Seq(
      (1L, "a b", "en"), (2L, "a b", "en"), (3L, "b a", "en")))
    val out = RetrievalQueries.docLogprob2(spark, dir)
      .select("doc_id", "nll2").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - math.log(3.0 / 2.0)) < 1e-3)
    assert(math.abs(out(3L) - math.log(3.0)) < 1e-3)
    assert(out(1L) < out(3L))
  }

  test("doc_logprob2: single-token docs have no transitions and are absent") {
    val dir = plantedDir(Seq((1L, "solo", "en"), (2L, "x y", "en")))
    val ids = RetrievalQueries.docLogprob2(spark, dir)
      .select("doc_id").as[Long].collect().toList
    assert(ids == List(2L))
  }

  test("dsir_weights: docs made of target-corpus tokens outweigh docs of " +
       "tokens the target never uses") {
    val dir = plantedDir(Seq(
      (1L, "t1 t2 t3 t4 t1 t2", "en"),
      (2L, "t1 t2 t3 t4", "fr"),     // target-like tokens, non-en doc
      (3L, "f1 f2 f3 f4 f5 f6", "fr"))) // tokens absent from en
    val out = RetrievalQueries.dsirWeights(spark, dir)
      .select("doc_id", "llr").as[(Long, Double)].collect().toMap
    assert(out(2L) > out(3L)) // weight follows CONTENT, not the lang label
    assert(out(1L) > out(3L))
  }

  test("pmi_bigrams: the planted exclusive collocation outranks a pair of " +
       "independently-frequent tokens") {
    // 'hong kong' always adjacent and exclusive; 'a b' co-occur but both
    // are everywhere (low PMI). Floor is PmiMinCount = 5.
    val coll = (1 to 6).map(_ => "hong kong").mkString(" ")
    val noise = (1 to 6).map(_ => "a b a c b a").mkString(" ")
    val dir = plantedDir(Seq((1L, coll, "en"), (2L, noise, "en")))
    val out = RetrievalQueries.pmiBigrams(spark, dir)
      .select("a", "b", "pmi").as[(String, String, Double)].collect()
    val pmi = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(pmi.contains(("hong", "kong")))
    assert(pmi(("hong", "kong")) > pmi.getOrElse(("a", "b"), Double.NegativeInfinity))
  }
}
