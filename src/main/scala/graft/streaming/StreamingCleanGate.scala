package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.CleanQueries

/** Streaming quality gate — the stream sibling of `gq_filter`: arriving
  * documents are scored against the Gopher quality heuristics
  * ([[CleanQueries.GqRules]]: word-count/mean-word-length bounds, symbol
  * and line-shape ratios, alphabetic-word fraction, required-stopword
  * minimum) and admitted or refused IN the arrival micro-batch —
  * upstream of the repetition gate and the dedup ledger, because the
  * quality rules are the cheapest reject (no gram scan, no state).
  * Pure row-local projections ([[CleanQueries.withGqSignals]]):
  * stateless, no watermark, no shuffle, source-throughput admission,
  * checkpoint replay reproduces every verdict. The verdict expressions
  * are SHARED with the batch filter ([[CleanQueries.gqVerdictCols]]),
  * so stream and batch can never disagree on the same document.
  */
object StreamingCleanGate {

  /** Gate a (doc_id, text) stream; works on a batch frame too — the
    * spec's parity path. Emits (doc_id, keep, n_violations,
    * first_violation, n_words, alpha_word_frac) — the verdict plus the
    * two headline signals a monitoring sink typically charts.
    */
  def gate(docs: DataFrame): DataFrame =
    CleanQueries.withGqSignals(docs.select("doc_id", "text"), "text")
      .select(Seq(col("doc_id")) ++ CleanQueries.gqVerdictCols
        ++ Seq(col("n_words"), col("alpha_word_frac")): _*)
}
