package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.queries.ScaleQueries.{KmBands, KmMins, KmRows, MinhashP}

/** Near-dup ADMISSION on a stream against the persisted MinHash
  * ledger (`dedup_ledger_build`): arriving documents compute their
  * banded bucket keys ROW-LOCALLY — gram array, two md5 base hashes,
  * the [[KmMins]] Kirsch-Mitzenmacher permutations as `array_min`
  * over `zip_with` — and stream-static equi-join the on-disk bucket
  * table on (band, key); candidates verify EXACT gram-set Jaccard
  * row-locally via `array_intersect` against a static
  * (hist_id, h_grams) side. Deliberately STATELESS: no watermark, no
  * state store, no stream-side shuffle or aggregation — the
  * [[StreamingProbeScore]] trade (row-local interpreted array HOFs
  * buy away per-batch shuffles; the batch pipeline keeps the
  * explode+groupBy shape for the opposite reason) applied to dedup.
  *
  * Delivery contract: one row PER COLLIDING BAND — at-least-once per
  * (batch, history) pair, like SendQueueStream's ledger rows; a pair
  * colliding in b bands is emitted b times with the same verified
  * jaccard_sim. Admission decisions are idempotent on the pair, so
  * the sink dedups or simply acts twice; the DISTINCT
  * (batch_id, hist_id, jaccard_sim) set equals the batch
  * `dedup_ledger_probe` output exactly (StreamingLedgerProbeSpec pins
  * this, which is also the guard against the row-local expressions
  * desyncing from the batch pipeline's shared constants).
  *
  * Scale shape: the bucket table joins as a stream-static equi-join
  * (re-read per micro-batch, broadcast or shuffled by size — at
  * 100 TB history the bucket side is keyed parquet, and per-batch
  * pruning rides the same (band, kb) directory layout the batch probe
  * prunes with); the gram-array side is history-doc-sized and in
  * production is the second persisted ledger artifact, rebuilt with
  * the buckets.
  */
object StreamingLedgerProbe {

  /** Row-local (doc_id, grams, band, key) — value-identical to the
    * batch kmGramFrame → kmBandKeys pipeline (shared constants; the
    * spec pins equality). Gram/hash columns are STAGED so each md5
    * transform evaluates once per row (the CollapseProject rule
    * [[StreamingProbeScore.score]] documents).
    */
  def bandKeys(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.wordTokens(lower(col("text")))
    val gramArr = array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - 3, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
    val staged = docs.select(col("doc_id"), gramArr.as("grams"))
      .select(col("doc_id"), col("grams"),
        transform(col("grams"),
          g => conv(substring(md5(g), 1, 8), 16, 10).cast("long")).as("h1s"),
        transform(col("grams"),
          g => conv(substring(md5(g), 9, 8), 16, 10).cast("long")).as("h2s"))
    val sigs = (0 until KmMins).map(s =>
      array_min(zip_with(col("h1s"), col("h2s"),
        (a, b) => (a + lit(s.toLong) * b) % MinhashP)).as(s"m$s"))
    staged.select(col("doc_id") +: col("grams") +: sigs: _*)
      .select(col("doc_id"), col("grams"),
        explode(array((0 until KmBands).map(b =>
          struct(lit(b).as("band"),
            concat_ws(":", (0 until KmRows).map(r => col(s"m${KmRows * b + r}")): _*)
              .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("grams"),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** @param stream    streaming (doc_id, text) frame
    * @param buckets   the persisted ledger bucket table (id, key, band, kb)
    * @param histGrams static (hist_id, h_grams) gram arrays
    * @param threshold exact-Jaccard accept threshold (the ledger's 0.5)
    */
  def score(stream: DataFrame, buckets: DataFrame, histGrams: DataFrame,
            threshold: Double): DataFrame = {
    val keyed = bandKeys(stream)
    val cands = keyed.join(
      buckets.select(col("id").as("hist_id"),
        col("band").cast("int").as("l_band"), col("key").as("l_key")),
      col("band") === col("l_band") && col("key") === col("l_key"))
    val withH = cands.join(histGrams, "hist_id")
    val inter = size(array_intersect(col("grams"), col("h_grams"))).cast("double")
    val j = inter / (size(col("grams")) + size(col("h_grams")) - inter)
    withH.select(col("doc_id").as("batch_id"), col("hist_id"),
        col("band"), j.as("jr"))
      .filter(col("jr") >= threshold)
      .select(col("batch_id"), col("hist_id"), col("band"),
        round(col("jr"), 6).as("jaccard_sim"))
  }
}
