package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One DP release request: `eps_micro` is the privacy cost in MICRO-ε
  * units (1 ε = 1 000 000) — integer units make the cap boundary exact
  * (a Double running sum would admit or refuse releases on fp dust,
  * and a privacy cap is precisely where that is not acceptable).
  */
final case class DpReq(consumer: String, release_id: Long, mechanism: String,
                       eps_micro: Long)

/** The accountant's verdict: every request is ANSWERED (refusals are
  * visible — a silently dropped release would look like a transport
  * failure and get retried into a double-spend attempt), `spent_after`
  * is the consumer's cumulative spend after this row.
  */
final case class DpVerdict(consumer: String, release_id: Long, mechanism: String,
                           eps_micro: Long, spent_after: Long, admitted: Boolean)

/** Stateful DP budget accounting over a stream of release requests —
  * the STATEFUL half of the `dp_budget` page (which accounts the four
  * REGISTERED mechanisms statically; a production system accumulates
  * spend across ad-hoc releases and must refuse the one that crosses
  * the cap). Built on `transformWithState` like [[StreamingQuota]]:
  * state per consumer is ONE long (micro-ε spent so far), so the
  * accountant is stream-forever safe, and the RocksDB store makes the
  * ledger restart-durable — a checkpoint replay cannot forget spend,
  * which for DP is the difference between a budget and a suggestion.
  *
  * Sequential composition is the accounting rule (every release reads
  * the same corpus): admitted ⇔ spent + eps ≤ cap. Intra-batch rows
  * fold in release_id order — deterministic admission for a given set
  * of micro-batches regardless of shuffle placement. A refused request
  * spends NOTHING (the mechanism never ran; emitting its refusal leaks
  * only the budget state, which is the accountant's own output, not
  * corpus data).
  */
class DpBudgetProcessor(capMicro: Long)
    extends StatefulProcessor[String, DpReq, DpVerdict] {

  @transient private var spent: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    spent = getHandle.getValueState[Long]("spent", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(consumer: String, rows: Iterator[DpReq],
                               timers: TimerValues): Iterator[DpVerdict] = {
    var s = if (spent.exists()) spent.get() else 0L
    val out = rows.toSeq.sortBy(_.release_id).map { r =>
      val ok = r.eps_micro >= 0 && s + r.eps_micro <= capMicro
      if (ok) s += r.eps_micro
      DpVerdict(consumer, r.release_id, r.mechanism, r.eps_micro, s, ok)
    }
    spent.update(s)
    out.iterator
  }
}

object StreamingDpBudget {
  /** Accountant over a request stream; `capMicro` is the per-consumer
    * lifetime budget in micro-ε. Works on a batch frame too — the
    * spec's parity path.
    */
  def apply(reqs: Dataset[DpReq], capMicro: Long): Dataset[DpVerdict] = {
    import reqs.sparkSession.implicits._
    reqs.groupByKey(_.consumer)
      .transformWithState(new DpBudgetProcessor(capMicro),
        TimeMode.None(), OutputMode.Append())
  }
}
