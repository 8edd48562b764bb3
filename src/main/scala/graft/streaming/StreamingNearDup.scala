package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import graft.operators.{Dedup, TextAnalysis}

final case class FpIn(source: String, doc_id: Long, sim: Long)
final case class NearDupOut(source: String, doc_id: Long, admitted: Boolean,
                            min_hamming: Int)

/** Streaming near-duplicate ADMISSION — the online rendition of
  * `dedup_simhash` / the streaming sibling of `dedup_incremental`: a
  * continuous ingest stream where each document is admitted only if no
  * recently-admitted document in its block is within `maxHamming` bits
  * of its 64-bit SimHash fingerprint. The ingest-side filter a
  * training-data pipeline runs BEFORE paying storage/tokenization for
  * a near-copy.
  *
  * Shape, built for an unbounded stream:
  *  - The fingerprint is computed row-locally in the stateless map
  *    phase ([[Dedup.simhash64]] — no aggregation before the stateful
  *    operator, so the query needs no watermark and admits in the
  *    arrival micro-batch).
  *  - State is per BLOCK (source — the same blocking the batch
  *    `dedup_ngram` uses): a bounded FIFO ring of the last
  *    `ringCapacity` admitted fingerprints held in a
  *    `transformWithState` [[ListState]]. Constant-size state per key,
  *    stream-forever safe; RocksDB-backed and restart-durable like
  *    [[StreamingQuota]].
  *  - Intra-batch rows fold in doc_id order, so admission is
  *    deterministic for a given micro-batch sequence regardless of
  *    shuffle order or cluster size.
  *
  * Dropping a dup NEVER inserts its fingerprint (the admitted original
  * already covers it); capacity eviction is strictly FIFO, so a
  * fingerprint is forgotten after `ringCapacity` newer admissions — the
  * documented recall bound of the bounded-state design (a re-arriving
  * copy after eviction re-admits, exactly like
  * `dropDuplicatesWithinWatermark` after state eviction).
  */
class NearDupProcessor(maxHamming: Int, ringCapacity: Int)
    extends StatefulProcessor[String, FpIn, NearDupOut] {

  @transient private var ring: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ring = getHandle.getListState[Long]("ring", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(source: String, rows: Iterator[FpIn],
                               timers: TimerValues): Iterator[NearDupOut] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    ring.get().foreach(buf += _)
    // The doc_id-ordered fold (determinism contract above) forces the
    // key's whole micro-batch through a sort, so per-batch heap is
    // O(rows-for-this-key) — but only 16 bytes/row: we strip each FpIn
    // to packed (doc_id, sim) longs before sorting, so a 10M-row
    // hot-key batch costs ~160 MB transient, not a Seq of case classes
    // with a String key apiece. State stays bounded at ringCapacity
    // regardless; cap micro-batch size via source admission
    // (maxOffsetsPerTrigger / maxFilesPerTrigger) if a single key can
    // exceed that transient budget.
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sims = scala.collection.mutable.ArrayBuffer.empty[Long]
    rows.foreach { d => ids += d.doc_id; sims += d.sim }
    val order = ids.indices.sortBy(ids)
    val out = order.iterator.map { i =>
      val sim = sims(i)
      val minH =
        if (buf.isEmpty) 64
        else buf.iterator.map(s => java.lang.Long.bitCount(s ^ sim)).min
      val admit = minH > maxHamming
      if (admit) {
        buf += sim
        if (buf.length > ringCapacity) buf.remove(0, buf.length - ringCapacity)
      }
      NearDupOut(source, ids(i), admit, minH)
    }.toVector
    ring.put(buf.toArray)
    out.iterator
  }
}

object StreamingNearDup {

  /** Fingerprint + admission over a raw (source, doc_id, text) stream. */
  def apply(docs: DataFrame, maxHamming: Int = 3,
            ringCapacity: Int = 1024): Dataset[NearDupOut] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("source"), col("doc_id"),
        Dedup.simhash64(TextAnalysis.wordTokens(col("text"))).as("sim"))
      .as[FpIn]
      .groupByKey(_.source)
      .transformWithState(new NearDupProcessor(maxHamming, ringCapacity),
        TimeMode.None(), OutputMode.Append())
  }
}
