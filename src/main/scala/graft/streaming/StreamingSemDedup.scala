package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import graft.operators.Similarity

final case class EmbIn(bucket: Int, vec_id: Long, nrm: Double, vec: Array[Float])
final case class StoredVec(nrm: Double, vec: Array[Float])
final case class SemAdmitOut(bucket: Int, vec_id: Long, admitted: Boolean,
                             max_cos: Double)

/** Streaming SEMANTIC dedup admission — the online rendition of
  * `sem_dedup` and the embedding sibling of [[StreamingNearDup]]: a
  * continuous embedding ingest where each vector is admitted only if no
  * recently-admitted vector in its block has cosine ≥ τ with it. The
  * ingest-side filter that keeps a training corpus from accumulating
  * semantic near-copies before storage is paid.
  *
  * Shape, built for an unbounded stream:
  *  - Blocking is a row-local sign-projection bucket
  *    ([[Similarity.lshBucket]] — literal hyperplanes, no model state,
  *    no aggregation before the stateful operator, so the query needs
  *    no watermark and admits in the arrival micro-batch). Near-dups
  *    collide with high probability; a cross-bucket near-dup is missed
  *    — the same documented recall bound as the batch LSH path, tuned
  *    by `planes`.
  *  - State per bucket is a bounded FIFO ring of the last
  *    `ringCapacity` ADMITTED vectors (norm + float array — (8 + 4·dim)
  *    bytes each) in a `transformWithState` [[ListState]]: constant
  *    state per key, stream-forever safe, RocksDB-backed and
  *    restart-durable.
  *  - Intra-batch rows fold in vec_id order, so admission is
  *    deterministic for a given micro-batch sequence regardless of
  *    shuffle order or cluster size. The per-batch transient buffer
  *    holds this key's vectors (4·dim B + 16 B per row); cap micro-batch
  *    size at the source if one bucket can exceed that budget.
  *
  * Dropping a near-copy never inserts it (the admitted original covers
  * it); FIFO eviction forgets a vector after `ringCapacity` newer
  * admissions, after which a re-arriving copy re-admits — the bounded-
  * state recall contract shared with [[StreamingNearDup]].
  */
class SemDedupProcessor(tau: Double, ringCapacity: Int)
    extends StatefulProcessor[Int, EmbIn, SemAdmitOut] {

  @transient private var ring: ListState[StoredVec] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ring = getHandle.getListState[StoredVec]("ring",
      Encoders.product[StoredVec], TTLConfig.NONE)

  private def cos(a: StoredVec, nrm: Double, v: Array[Float]): Double = {
    var dot = 0.0
    var i = 0
    val n = math.min(a.vec.length, v.length)
    while (i < n) { dot += a.vec(i).toDouble * v(i).toDouble; i += 1 }
    dot / (a.nrm * nrm)
  }

  override def handleInputRows(bucket: Int, rows: Iterator[EmbIn],
                               timers: TimerValues): Iterator[SemAdmitOut] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[StoredVec]
    ring.get().foreach(buf += _)
    val batch = rows.toArray.sortBy(_.vec_id)
    val out = batch.iterator.map { e =>
      val maxCos =
        if (buf.isEmpty) -1.0
        else buf.iterator.map(s => cos(s, e.nrm, e.vec)).max
      val admit = maxCos < tau
      if (admit) {
        buf += StoredVec(e.nrm, e.vec)
        if (buf.length > ringCapacity) buf.remove(0, buf.length - ringCapacity)
      }
      SemAdmitOut(bucket, e.vec_id, admit, maxCos)
    }.toVector
    ring.put(buf.toArray)
    out.iterator
  }
}

object StreamingSemDedup {

  /** Bucket + admission over a raw (vec_id, embedding) stream. */
  def apply(embs: DataFrame, dim: Int, tau: Double = 0.9,
            planes: Int = 8, ringCapacity: Int = 256): Dataset[SemAdmitOut] = {
    import embs.sparkSession.implicits._
    embs
      .select(
        Similarity.lshBucket(col("embedding"), dim, planes, table = 0)
          .cast("int").as("bucket"),
        col("vec_id"),
        Similarity.norm(col("embedding")).as("nrm"),
        col("embedding").as("vec"))
      .as[EmbIn]
      .groupByKey(_.bucket)
      .transformWithState(new SemDedupProcessor(tau, ringCapacity),
        TimeMode.None(), OutputMode.Append())
  }
}
