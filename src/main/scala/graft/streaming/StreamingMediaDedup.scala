package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import graft.operators.Multimodal

/** Streaming MEDIA near-duplicate admission — the perceptual-hash
  * rendition of [[StreamingNearDup]] (which covers text SimHash): a
  * continuous image/audio/video ingest where each payload is admitted
  * only if no recently-admitted clip in its block is within
  * `maxHamming` bits of its 64-bit fingerprint. The ingest gate a
  * multimodal training pipeline runs BEFORE paying storage + feature
  * extraction for a re-encode of something it already has.
  *
  * Composition, not duplication: the DECODE is the stateless map
  * phase — [[Multimodal.mediaFingerprint]] dispatches per kind (image
  * pHash / audio FFT fingerprint / video TIRI bits), runs
  * executor-local inside `mapPartitions`, and undecodable payloads
  * drop out without failing the stream; ADMISSION then reuses
  * [[NearDupProcessor]] verbatim — the bounded FIFO ring per block,
  * deterministic doc_id-ordered intra-batch fold, RocksDB-backed
  * restart-durable state, and the documented eviction recall bound
  * all carry over unchanged, because a 64-bit Hamming admission is
  * the same operator whatever produced the bits.
  */
object StreamingMediaDedup {

  /** Fingerprint + admission over a raw (source, doc_id, kind,
    * payload) stream. Works on a batch frame too — the spec's parity
    * path.
    */
  def apply(media: DataFrame, maxHamming: Int = 3,
            ringCapacity: Int = 1024): Dataset[NearDupOut] = {
    import media.sparkSession.implicits._
    media
      .select(col("source"), col("doc_id").cast("long"),
        col("kind"), col("payload"))
      .as[(String, Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (src, id, kind, p) =>
        // block key = source/kind: fingerprint SPACES differ per kind
        // (a pHash and a TIRI hash are incommensurable 64-bit values),
        // so a cross-kind coincidence must never reject a clip — kinds
        // get independent rings by construction, not by luck
        Multimodal.mediaFingerprint(kind, p).map(h => FpIn(s"$src/$kind", id, h))
      })
      .groupByKey(_.source)
      .transformWithState(new NearDupProcessor(maxHamming, ringCapacity),
        TimeMode.None(), OutputMode.Append())
  }
}
