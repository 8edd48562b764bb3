package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Planted-truth checks for the unigram-LM trainer: Viterbi optimality
  * and tie-breaks against hand-derived segmentations, EM invariants
  * (char closure, exact-integer usage, normalized probabilities,
  * zero-usage pruning) on a tiny constructed vocab.
  */
class UnigramLmSpec extends AnyFunSuite {

  test("viterbi picks the max-probability segmentation") {
    val logp = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -5.0)
    // ab|c = -6 beats a|b|c = -9
    assert(UnigramLm.viterbi("abc", logp) == Seq("ab", "c"))
    // unsegmentable suffix -> empty
    assert(UnigramLm.viterbi("abd", logp).isEmpty)
  }

  test("exact score tie breaks to the longest piece (smallest start)") {
    val logp = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    // ab (one piece, -2) ties a|b (-2): start 0 beats start 1
    assert(UnigramLm.viterbi("ab", logp) == Seq("ab"))
  }

  test("EM: char closure, exact usage accounting, normalization, pruning") {
    val words = Map("aaab" -> 10L, "aab" -> 5L, "zz" -> 1L)
    val m = UnigramLm.train(words)
    // every char of the vocab survives all rounds (the +1 floor)
    for (ch <- Seq("a", "b", "z"))
      assert(m.logp.contains(ch), s"char $ch pruned")
    // probabilities normalize: sum exp(logp) = 1
    val mass = m.logp.values.map(math.exp).sum
    assert(math.abs(mass - 1.0) < 1e-12, s"prob mass $mass")
    // usage is exact-integer and consistent with a replayed E-step
    // (one more Viterbi pass under the final model, plus char floors)
    val replay = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      UnigramLm.viterbi(w, m.logp).foreach(p =>
        replay(p) = replay.getOrElse(p, 0L) + f)
    }
    m.usage.foreach { case (p, u) =>
      val expect = replay.getOrElse(p, 0L) + (if (p.length == 1) 1L else 0L)
      assert(u == expect, s"usage of '$p': $u vs $expect")
    }
    // a seeded multi-char piece the corpus stopped using is gone:
    // every surviving non-char piece has positive replayed usage
    m.usage.filter(_._1.length > 1).foreach { case (p, u) =>
      assert(u > 0 && replay.getOrElse(p, 0L) > 0, s"dead piece '$p' survived")
    }
  }

  test("trained segmentation prefers whole frequent words over char soup") {
    val words = Map("spark" -> 100L, "scan" -> 80L, "a" -> 50L)
    val m = UnigramLm.train(words)
    assert(UnigramLm.viterbi("spark", m.logp).length <= 2,
      "a dominant word must not segment into char soup")
  }

  test("vocab bound: long-tail corpora are capped, the test corpus is not") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // a long-tail vocab: 10 head words (f >= 100), 2000 singletons,
    // one word past the oracle unroll length — the 100 TB shape in
    // miniature. The bound must keep exactly the head.
    val tail = (1 to 2000).map(i => (f"tail$i%04d", 1L))
    val head = (1 to 10).map(i => (s"head$i", 100L + i))
    val long = ((("waytoolongword", 500L)) +: (head ++ tail)).toDF("w", "f")
    val vocab = graft.queries.CorpusQueries.boundedUnigramVocab(long)
    assert(vocab.keySet == head.map(_._1).toSet, s"got ${vocab.size} words")
    // the real corpus sits far inside every bound (31 words, min f 26,
    // max len 8 measured at all SFs), so the cap provably changes no
    // registered query: below-threshold frames pass through intact.
    val small = Seq(("alpha", 26L), ("beta", 255L), ("gamma", 26L))
      .toDF("w", "f")
    assert(graft.queries.CorpusQueries.boundedUnigramVocab(small) ==
      Map("alpha" -> 26L, "beta" -> 255L, "gamma" -> 26L))
    // the cap itself is a TOTAL order: ties on f break by word
    val tied = (1 to 1030).map(i => (f"w$i%04d", 5L)).toDF("w", "f")
    val capped = graft.queries.CorpusQueries.boundedUnigramVocab(tied)
    assert(capped.size == graft.queries.CorpusQueries.UgTopV)
    assert(capped.keySet == (1 to 1024).map(i => f"w$i%04d").toSet)
  }
}
