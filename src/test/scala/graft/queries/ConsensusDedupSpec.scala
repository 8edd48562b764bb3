package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Planted multi-modality family for `dedup_consensus`
  * ([[CorpusQueries.dedupConsensusOn]]): four documents chained by
  * DIFFERENT evidence modalities must resolve into ONE component, with
  * per-edge provenance naming exactly the detectors that fired.
  *
  * The plant (word-3-gram arithmetic, 10-token docs → 8 grams):
  *   1–2 share 8 of 10 tokens → 6 shared grams: J = 6/10 = 0.6 ≥ 0.5
  *       (jaccard fires), containment 6/8 = 0.75 < 0.8 (does not),
  *       suffix words differ by ≫ 3 edits (edit does not);
  *   2–3 differ by ONE character in the last word → J = 7/9 ≈ 0.78,
  *       containment 7/8 = 0.875, Levenshtein 1 — ALL THREE fire;
  *   3–4 doc 4 embeds doc 3 verbatim plus 30 unrelated words →
  *       containment 8/8 = 1 fires alone (J ≈ 8/38, |len Δ| ≫ 3);
  *   5   shares nothing → appears in no edge.
  */
class ConsensusDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val extra = (1 to 30).map(i => s"pad$i").mkString(" ")
  private val d1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
  private val d2 = "alpha bravo charlie delta echo foxtrot golf hotel kilo lima"
  private val d3 = "alpha bravo charlie delta echo foxtrot golf hotel kilo limo"
  private val d4 = s"$d3 $extra"
  private val d5 = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec"

  private lazy val docs = Seq(
    (1L, d1), (2L, d2), (3L, d3), (4L, d4), (5L, d5)
  ).toDF("doc_id", "text")

  private lazy val result = CorpusQueries.dedupConsensusOn(docs)
    .collect()
    .map(r => ((r.getLong(0), r.getLong(1)),
      (r.getLong(2), r.getString(3), r.getLong(4))))
    .toMap

  test("each planted edge carries exactly the modalities that fired") {
    assert(result((1L, 2L))._2 == "jaccard")
    assert(result((2L, 3L))._2 == "containment,edit,jaccard")
    assert(result((3L, 4L))._2 == "containment")
    // n_modalities always equals the provenance list length
    result.values.foreach { case (n, mods, _) =>
      assert(n == mods.split(",").length)
    }
  }

  test("the union graph resolves to one component; unrelated doc stays out") {
    // every edge's component collapses to the chain minimum (doc 1)
    assert(result.values.map(_._3).toSet == Set(1L))
    // doc 5 shares no modality with anyone
    assert(!result.keySet.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("hash-seeded modalities plug into the same union without disturbing it") {
    // the registered query keeps the oracle-portable three; a pipeline
    // that also runs MinHash unions its pairs in as one more modality —
    // provenance strings only gain entries, components only merge
    val base = CorpusQueries.consensusEdges(docs)
    val mh = graft.operators.Dedup
      .minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select(col("a_id"), col("b_id"), lit("minhash").as("modality"))
    val extended = base.union(mh)
      .groupBy("a_id", "b_id")
      .agg(array_join(array_sort(collect_set(col("modality"))), ",").as("mods"))
      .as[(Long, Long, String)].collect()
      .map { case (a, b, m) => (a, b) -> m }.toMap
    result.foreach { case (pair, (_, mods, _)) =>
      val ext = extended(pair).split(",").toSet
      assert(mods.split(",").toSet.subsetOf(ext), s"$pair lost modalities")
    }
  }
}
