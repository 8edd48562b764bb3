package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.CleanQueries

/** Streaming C4 gate — the stream sibling of `c4_clean` over REAL
  * document structure: arriving (doc_id, text) rows are split on
  * newlines and pushed through the shared C4 pipeline core
  * ([[CleanQueries.c4Core]]: terminal-punctuation/5-word/javascript
  * line filters, then blocklist/lorem-ipsum/brace/sentence-minimum page
  * rules), emitting the page verdict, the first kill reason, and the
  * md5 of the cleaned page IN the arrival micro-batch. Stateless
  * row-local projections: no watermark, no shuffle, source-throughput
  * admission, checkpoint replay reproduces every verdict. Because the
  * rule expressions are the SAME objects the batch query evaluates,
  * stream and batch can never disagree on the same lines.
  */
object StreamingC4Gate {

  /** Gate a (doc_id, text) stream; works on a batch frame too — the
    * spec's parity path. Emits (doc_id, n_lines, kept_lines,
    * n_sentences, keep, first_reason, clean_fp).
    */
  def gate(docs: DataFrame): DataFrame =
    CleanQueries.c4Core(
      // \r?\n: a CRLF document must yield \r-free lines, or the core's
      // end-anchored terminal-punctuation rule rejects every line
      docs.select(col("doc_id"), split(col("text"), "\\r?\\n").as("__lines")))
}
