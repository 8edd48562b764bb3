package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.TextAnalysis

/** `dedup_consensus_keep_best` ([[CorpusQueries.dedupConsensusKeepBestOn]])
  * over the SAME planted multi-modality family as [[ConsensusDedupSpec]]:
  * docs 1–4 chain into one consensus component (jaccard 1–2,
  * all-three 2–3, containment 3–4), doc 5 is untouched. The keeper must
  * be the component's quality argmax (doc 4 — it embeds doc 3 verbatim
  * plus 30 distinct pad words, so its length and TTR terms dominate),
  * every other member must point at it with kept = false, and the
  * singleton must keep itself.
  */
class ConsensusKeepBestSpec extends AnyFunSuite {
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

  private lazy val rows = CorpusQueries.dedupConsensusKeepBestOn(docs)
    .collect()
    .map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    .toMap

  test("one keeper per component, chosen by quality argmax") {
    // docs 1-4: one component, keeper = doc 4 (quality argmax)
    val clusters = (1L to 4L).map(rows(_)._1).distinct
    assert(clusters.size == 1)
    (1L to 4L).foreach { id => assert(rows(id)._3 == 4L) }
    assert(rows(4L)._4 && !rows(1L)._4 && !rows(2L)._4 && !rows(3L)._4)
    // the keeper really is the quality argmax, checked against the
    // standalone quality expression
    val q = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(4L) == (1L to 4L).map(q).max)
    // reported quality matches the standalone expression per row
    rows.foreach { case (id, (_, quality, _, _)) => assert(quality == q(id)) }
  }

  test("a singleton keeps itself in its own component") {
    assert(rows(5L) == ((5L, rows(5L)._2, 5L, true)))
    assert(rows(5L)._1 != rows(1L)._1)
  }
}
