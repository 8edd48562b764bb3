package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the round-6 corpus operators: planted corpora for
  * the span/prefix/pair queries, a driver-side integer-PageRank replay,
  * and window-multiplicity invariants for the sliding aggregation.
  */
class CorpusQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Writes a (doc_id, text, lang, source, n_chars) frame into a temp dir
    * under the `documents.parquet` name the queries expect.
    */
  private def plantedDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dup_spans finds the planted cross-doc span and merges its windows") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docA = ((1 to 5).map(i => s"x$i") ++ (1 to 10).map(i => s"s$i") ++
      (6 to 20).map(i => s"x$i")).mkString(" ")         // span at tokens 5..14 of 30
    val docB = shared + " " + (1 to 10).map(i => s"y$i").mkString(" ") // span at 0..9 of 20
    val docC = (1 to 25).map(i => s"z$i").mkString(" ") // unique — no row expected
    val dir = plantedDir(Seq((1L, docA), (2L, docB), (3L, docC)))
    val out = CorpusQueries.dupSpans(spark, dir)
      .select("doc_id", "n_spans", "dup_tokens", "dup_ratio")
      .as[(Long, Long, Long, Double)].collect().toList
    // K=8 windows fully inside the 10-token span: starts {5,6,7} in A,
    // {0,1,2} in B → one merged island each, covering exactly the span
    assert(out == List(
      (1L, 1L, 10L, math.round(10.0 / 30 * 1e6) / 1e6),
      (2L, 1L, 10L, 0.5)))
  }

  test("dup_spans ignores purely intra-document repetition") {
    val rep = (1 to 12).map(i => s"r$i").mkString(" ")
    val doc = rep + " " + rep // same 12-token run twice in ONE doc
    val dir = plantedDir(Seq((1L, doc), (2L, "totally unrelated words here")))
    assert(CorpusQueries.dupSpans(spark, dir).count() == 0)
  }

  test("dedup_prefix returns exactly the full exact-Jaccard join result") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running through the field"
    val corpus = Seq(
      (1L, base),
      (2L, base + " today"),
      (3L, base.replace("quick", "rapid")),
      (4L, "completely different text about spark partitions and shuffles at scale"),
      (5L, "another unrelated document mentioning joins aggregates and windows"))
    val dir = plantedDir(corpus)
    val got = CorpusQueries.dedupPrefix(spark, dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // driver-side brute force: distinct word 3-grams, all-pairs Jaccard
    def grams(t: String): Set[String] = {
      val w = t.trim.split("\\s+")
      (0 to math.max(w.length - 3, 0)).map(i => w.slice(i, i + 3).mkString(" ")).toSet
    }
    val g = corpus.map { case (id, t) => id -> grams(t) }.toMap
    val want = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      inter = (g(a) & g(b)).size.toDouble
      jac = inter / (g(a).size + g(b).size - inter) if jac >= 0.5
    } yield (a, b)).toSet
    assert(got == want && want.nonEmpty)
  }

  test("pagerank matches a driver-side integer replay at sf0.001") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .distinct().as[(Long, Long)].collect()
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toList).toMap
    val edges = byOrder.values.flatMap { parts =>
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.toSet
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey").cast("long")).as[Long].collect()
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to CorpusQueries.PrIters) {
      val cs = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) cs(d) += pr(s) / outdeg(s)
      pr = nodes.map(n => n -> (150000L + 85L * cs(n) / 100L)).toMap
    }
    val want = pr.toSeq.sortBy { case (n, p) => (-p, n) }.take(100).toList
    val got = CorpusQueries.pagerank(spark, sf)
      .as[(Long, Long)].collect().toList
    assert(got == want)
  }

  test("bpe_pairs counts adjacent pairs with deterministic ordering") {
    val dir = plantedDir(Seq((1L, "a b a b c"), (2L, "a b x"), (3L, "solo")))
    val out = CorpusQueries.bpePairs(spark, dir)
      .as[(String, String, Long)].collect().toList
    assert(out.head == ("a", "b", 3L))
    assert(out.map(_._3) == out.map(_._3).sorted(Ordering[Long].reverse))
    assert(!out.exists(r => r._1 == "solo" || r._2 == "solo")) // 1-token doc skipped
  }

  test("bpe_merges runs greedy merge rounds with lexicographic tie-break") {
    // vocab: "aaa"×2 → " a  a  a ", "ab"×2 → " a  b "
    val dir = plantedDir(Seq((1L, "aaa aaa ab"), (2L, "ab")))
    val out = CorpusQueries.bpeMerges(spark, dir)
      .as[(Long, String, String, Long)].collect().toList
    // r1: (a,a) n=4 beats (a,b) n=2; greedy left-to-right re-tokenize
    //     makes "aaa" → [aa, a] (NOT [a, aa] — replace scans from the left)
    // r2: (aa,a) n=2 ties (a,b) n=2 → (s1,s2)-lexicographic picks (a,b)
    // r3: (aa,a) is the only pair left
    // r4..6: no adjacent pairs remain → no winner rows (both engines
    //        agree: an empty round leaves the union short, not null-padded)
    assert(out == List((1L, "a", "a", 4L), (2L, "a", "b", 2L), (3L, "aa", "a", 2L)))
  }

  test("bpe_encode: fertility = symbols per word under the learned merges") {
    // same corpus as the merges test: after 3 learnable merges the
    // final vocab is aaa → [aaa] (1 symbol), ab → [ab] (1 symbol)
    val dir = plantedDir(Seq((1L, "aaa aaa ab"), (2L, "ab")))
    val out = CorpusQueries.bpeEncode(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(out == List((1L, 3L, 3L, 1.0), (2L, 1L, 1L, 1.0)))
    // a rare word stays char-split when all 6 rounds go to dominant
    // pairs: fertility > 1 is exactly the tokenizer-eval signal
    val dir2 = plantedDir(Seq(
      (1L, ("ab cd ef gh ij kl " * 10).trim), // six n=10 pairs eat all rounds
      (2L, "qrs")))                           // (q,r)/(r,s) at n=1 never win
    val out2 = CorpusQueries.bpeEncode(spark, dir2)
      .select("doc_id", "fertility").as[(Long, Double)].collect().toMap
    assert(out2(1L) == 1.0)
    assert(out2(2L) == 3.0)
  }

  test("events_sliding: every event lands in exactly 4 windows") {
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    val sliding = CorpusQueries.eventsSliding(spark, sf)
    assert(sliding.agg(sum("n_events")).head().getLong(0) == 4 * total)
  }

  test("outlier_mad and data_card invariants at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nDocs = docs.count()
    val nSources = docs.select("source").distinct().count()
    val om = CorpusQueries.outlierMad(spark, sf)
      .select("source", "n_outliers").as[(String, Long)].collect()
    assert(om.length == nSources && om.forall(_._2 >= 0))
    val dc = CorpusQueries.dataCard(spark, sf).collect()
    assert(dc.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(dc.forall { r =>
      val q = r.getAs[Double]("mean_quality")
      q >= 0.0 && q <= 1.0 &&
        r.getAs[Long]("n_english") <= r.getAs[Long]("n_docs") &&
        r.getAs[Long]("n_dups") < r.getAs[Long]("n_docs")
    })
  }
}
