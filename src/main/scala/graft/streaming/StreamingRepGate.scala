package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.QualityQueries

/** Streaming repetition-quality gate — the stream sibling of
  * `rep_filter`: arriving documents are scored against the Gopher
  * §A1.1 repetition rules ([[QualityQueries.RepThresholds]]) and
  * admitted or refused IN the arrival micro-batch, before a
  * degenerate document reaches the dedup ledger or the tokenizer
  * corpus. Pure row-local projections ([[QualityQueries
  * .withRepSignals]] — the run-scan HOFs): stateless, no watermark,
  * no shuffle, so the gate admits at source throughput and a
  * checkpoint replay trivially reproduces every verdict. The verdict
  * expressions are SHARED with the batch filter
  * ([[QualityQueries.repVerdictCols]]), so stream and batch can never
  * disagree on the same document.
  */
object StreamingRepGate {

  /** Gate a (doc_id, text) stream; works on a batch frame too — the
    * spec's parity path. Emits (doc_id, keep, n_violations,
    * first_violation, top2_frac, dup_line_frac) — the verdict plus the
    * two headline signals a monitoring sink typically charts.
    */
  def gate(docs: DataFrame): DataFrame =
    QualityQueries.withRepSignals(docs.select("doc_id", "text"), "text")
      .select(Seq(col("doc_id")) ++ QualityQueries.repVerdictCols
        ++ Seq(col("top2_frac"), col("dup_line_frac")): _*)
}
