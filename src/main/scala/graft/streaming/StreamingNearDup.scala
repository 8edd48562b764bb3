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
    val out = rows.toSeq.sortBy(_.doc_id).map { d =>
      val minH =
        if (buf.isEmpty) 64
        else buf.iterator.map(s => java.lang.Long.bitCount(s ^ d.sim)).min
      val admit = minH > maxHamming
      if (admit) {
        buf += d.sim
        if (buf.length > ringCapacity) buf.remove(0, buf.length - ringCapacity)
      }
      NearDupOut(source, d.doc_id, admit, minH)
    }
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
