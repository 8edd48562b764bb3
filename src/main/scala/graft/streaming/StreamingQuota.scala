package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

final case class DocIn(source: String, doc_id: Long, n_tokens: Long)
final case class AdmitOut(source: String, doc_id: Long, n_tokens: Long, used_after: Long)

/** Per-source token-budget admission over a continuous ingest stream —
  * the streaming rendition of quota sampling: each source may
  * contribute at most `budget` tokens EVER; once its running total
  * would cross the cap, further documents are dropped. Built on
  * Spark 4's `transformWithState` (the arbitrary-state API that
  * replaces `mapGroupsWithState`): state per source is ONE long (the
  * tokens admitted so far), read/updated through a typed
  * [[ValueState]] — constant-size state per key, stream-forever safe.
  *
  * Intra-batch arrival order is shuffle-dependent, so rows are folded
  * in doc_id order — admission is deterministic for a given set of
  * micro-batches regardless of cluster size.
  *
  * Requires the RocksDB state store (a `transformWithState`
  * constraint, not ours).
  */
class QuotaProcessor(budget: Long)
    extends StatefulProcessor[String, DocIn, AdmitOut] {

  @transient private var used: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    used = getHandle.getValueState[Long]("used", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(source: String, rows: Iterator[DocIn],
                               timers: TimerValues): Iterator[AdmitOut] = {
    var u = if (used.exists()) used.get() else 0L
    val admitted = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
      if (u + d.n_tokens <= budget) {
        u += d.n_tokens
        Some(AdmitOut(source, d.doc_id, d.n_tokens, u))
      } else None
    }
    used.update(u)
    admitted.iterator
  }
}

object StreamingQuota {
  def apply(docs: Dataset[DocIn], budgetPerSource: Long): Dataset[AdmitOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new QuotaProcessor(budgetPerSource),
        TimeMode.None(), OutputMode.Append())
  }
}
