package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and keeps running through the field"

  private def corpus = Seq(
    (1L, base),
    (2L, base + " today"),                                  // near-dup of 1
    (3L, base.replace("quick", "rapid")),                   // near-dup of 1
    (4L, "completely different text about spark partitions and shuffles at scale"),
    (5L, "another unrelated document mentioning joins aggregates and windows"))
    .toDF("doc_id", "text")

  test("minhash LSH finds planted near-dups and skips unrelated docs") {
    val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard is exact on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("j"))
    assert(math.abs(df.head().getDouble(0) - 0.5) < 1e-12)
  }

  test("word ngrams: count and shape") {
    val ng = Seq("a b c d").toDF("t")
      .select(Dedup.wordNgrams(split(col("t"), " "), 3).as("ng"))
      .head().getSeq[String](0)
    assert(ng == Seq("a b c", "b c d"))
    // shorter than n falls back to the single full-window gram
    val short = Seq("a b").toDF("t")
      .select(Dedup.wordNgrams(split(col("t"), " "), 3).as("ng"))
      .head().getSeq[String](0)
    assert(short == Seq("a b"))
  }

  // SimHash margins need enough tokens to be stable: with n votes per bit
  // the margin is ~sqrt(n), so one changed token only flips bits whose
  // margin is ±1. Use a 200-token doc like a realistic corpus entry.
  private val longBase = (1 to 200).map(i => s"tok${i % 97}").mkString(" ")

  test("simhash: identical texts collide, one-token edits stay close, distant texts far") {
    val sigs = Seq(
      (1L, longBase),
      (2L, longBase),
      (3L, longBase + " extra"),
      (4L, (1 to 200).map(i => s"other${i % 89}").mkString(" ")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash64(TextAnalysis.wordTokens(col("text"))).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 6)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 10)
  }

  test("simhash near-dup pairs via banding") {
    val docs = Seq(
      (1L, longBase),
      (2L, longBase + " extra"),
      (3L, (1 to 200).map(i => s"other${i % 89}").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("codegen'd agg simhash equals the column-expression simhash") {
    val docs = Seq((1L, longBase), (2L, base), (3L, "one two three"))
      .toDF("doc_id", "text")
    val viaAgg = Dedup.simhashSignatures(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val viaCol = docs.select(col("doc_id"),
      Dedup.simhash64(TextAnalysis.wordTokens(col("text"))).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(viaAgg == viaCol)
  }

  test("packed simhash survives a 70k-token document under ANSI mode") {
    // regression: with 16-bit lanes the top accumulator (offset 48)
    // crosses 2^63 at 32 768 set bits and ANSI sum() THROWS; 32-bit
    // lanes stay below 2^63 for any doc under 2^31 tokens
    val giant = (0 until 70000).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, giant)).toDF("doc_id", "text")
    val viaAgg = Dedup.simhashSignatures(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val viaCol = df.select(col("doc_id"),
      Dedup.simhash64(TextAnalysis.wordTokens(col("text"))).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(viaAgg == viaCol)
  }

  test("minhash candidate generation is a bucket equi-join, not a cross join") {
    val plan = Dedup.minhashCandidates(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("maxBucket caps a planted boilerplate bucket without touching sparse pairs") {
    import spark.implicits._
    // 40 clones of one boilerplate text (every band hot), plus one
    // genuine near-dup pair with distinctive vocabulary
    val boiler = (100L until 140L).map(i =>
      (i, "terms and conditions apply to all purchases made here"))
    val pair = Seq(
      (1L, "unique quantum butterfly poem dances over violet meadows"),
      (2L, "unique quantum butterfly poem dances over violet meadow"))
    val df = (boiler ++ pair).toDF("doc_id", "text")

    val uncapped = Dedup.minhashCandidates(df, "doc_id", "text")
    assert(uncapped.count() >= 40L * 39 / 2) // quadratic fan-out is real

    val capped = Dedup.minhashCandidates(df, "doc_id", "text", maxBucket = 8)
      .as[(Long, Long)].collect().toSet
    assert(capped.forall { case (a, b) => a < 100L && b < 100L },
      s"boilerplate pairs survived the cap: $capped")
    assert(capped.contains((1L, 2L)), "sparse near-dup pair lost by the cap")
  }

  test("capGramDocFreq drops only grams above the doc-frequency cap") {
    // one gram ("shared common boilerplate") planted in 30 docs; each doc
    // also carries rare grams from its unique tail
    val df = (0L until 30L).map(i =>
      (i, s"shared common boilerplate unique$i tail$i words$i"))
      .toDF("doc_id", "text")
    val grams = Dedup.explodedNgrams(df, "doc_id", "text")
    val total = grams.count()
    val capped = Dedup.capGramDocFreq(grams, maxDocFreq = 10)
    // exactly one gram hash has df = 30 (the shared prefix); every other
    // gram includes a unique token, so df = 1 and survives
    assert(capped.count() == total - 30)
    // cap off is the identity, no join in the plan
    assert(Dedup.capGramDocFreq(grams, Int.MaxValue) eq grams)
  }

  test("doc-frequency cap bounds the exact-Jaccard pair join fan-out") {
    // 30 docs sharing ONLY boilerplate: uncapped, the gram-equality join
    // emits a quadratic candidate set; capped, those pairs never form.
    // Two docs with rare shared vocabulary must survive the cap.
    val boiler = (100L until 130L).map(i =>
      (i, s"terms and conditions apply everywhere uniq$i"))
    val pair = Seq(
      (1L, "unique quantum butterfly poem dances over violet meadows"),
      (2L, "unique quantum butterfly poem dances over violet meadow"))
    val df = (boiler ++ pair).toDF("doc_id", "text")

    def pairsWith(maxDocFreq: Int): Set[(Long, Long)] =
      Dedup.minhashNearDups(df, "doc_id", "text", threshold = 0.1,
        bands = 8, rowsPer = 4, maxDocFreq = maxDocFreq)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    val uncapped = pairsWith(Int.MaxValue)
    assert(uncapped.exists { case (a, b) => a >= 100L && b >= 100L },
      "expected boilerplate pairs without a cap")
    val capped = pairsWith(10)
    assert(capped.forall { case (a, b) => a < 100L && b < 100L },
      s"boilerplate-only pairs survived the doc-frequency cap: $capped")
    assert(capped.contains((1L, 2L)), "rare-vocabulary pair lost by the cap")
  }
}
