package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One DP release request: `eps_micro` is the privacy cost in MICRO-ε
  * units (1 ε = 1 000 000) — integer units make the cap boundary exact
  * (a Double running sum would admit or refuse releases on fp dust,
  * and a privacy cap is precisely where that is not acceptable).
  *
  * CONTRACT: `release_id` is strictly increasing per consumer. The
  * accountant uses it for two things — deterministic intra-batch fold
  * order, and redelivery detection: an id at or below the highest id
  * already answered for that consumer is an at-least-once redelivery
  * (file source re-listing, upstream retry) and is answered as a
  * `duplicate` that spends NOTHING, so a redelivered admit cannot
  * double-spend the budget.
  */
final case class DpReq(consumer: String, release_id: Long, mechanism: String,
                       eps_micro: Long)

/** The accountant's verdict: every request is ANSWERED (refusals are
  * visible — a silently dropped release would look like a transport
  * failure and get retried into a double-spend attempt), `spent_after`
  * is the consumer's cumulative spend after this row. `duplicate`
  * marks an already-answered release_id redelivered by an
  * at-least-once source: answered (visibly), admitted = false, zero
  * spend — the original verdict stands.
  */
final case class DpVerdict(consumer: String, release_id: Long, mechanism: String,
                           eps_micro: Long, spent_after: Long, admitted: Boolean,
                           duplicate: Boolean)

/** Stateful DP budget accounting over a stream of release requests —
  * the STATEFUL half of the `dp_budget` page (which accounts the four
  * REGISTERED mechanisms statically; a production system accumulates
  * spend across ad-hoc releases and must refuse the one that crosses
  * the cap). Built on `transformWithState` like [[StreamingQuota]]:
  * state per consumer is TWO longs (micro-ε spent so far + highest
  * release_id answered), so the accountant is stream-forever safe, and
  * the RocksDB store makes the ledger restart-durable — a checkpoint
  * replay cannot forget spend, which for DP is the difference between
  * a budget and a suggestion.
  *
  * Sequential composition is the accounting rule (every release reads
  * the same corpus): admitted ⇔ spent + eps ≤ cap, evaluated as the
  * overflow-safe `eps ≤ cap − spent` (spent is always in [0, cap], so
  * the subtraction cannot wrap; the naive sum wraps negative for a
  * Long.MaxValue request and would ADMIT it — a cap bypass). Intra-
  * batch rows fold in release_id order — deterministic admission for a
  * given set of micro-batches regardless of shuffle placement; the
  * monotone release_id contract (see [[DpReq]]) is what makes that
  * order well-defined across batches too. A refused request spends
  * NOTHING (the mechanism never ran; emitting its refusal leaks only
  * the budget state, which is the accountant's own output, not corpus
  * data).
  */
class DpBudgetProcessor(capMicro: Long)
    extends StatefulProcessor[String, DpReq, DpVerdict] {

  @transient private var spent: ValueState[Long] = _
  @transient private var lastId: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    spent = getHandle.getValueState[Long]("spent", Encoders.scalaLong, TTLConfig.NONE)
    lastId = getHandle.getValueState[Long]("lastId", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(consumer: String, rows: Iterator[DpReq],
                               timers: TimerValues): Iterator[DpVerdict] = {
    var s = if (spent.exists()) spent.get() else 0L
    var hi = if (lastId.exists()) lastId.get() else Long.MinValue
    val out = rows.toSeq.sortBy(_.release_id).map { r =>
      if (r.release_id <= hi) {
        // Redelivery of an already-answered id (or a contract breach —
        // either way the safe answer is the spend-free one).
        DpVerdict(consumer, r.release_id, r.mechanism, r.eps_micro, s,
          admitted = false, duplicate = true)
      } else {
        hi = r.release_id
        // Overflow-safe: s ∈ [0, capMicro] ⇒ capMicro - s never wraps.
        val ok = r.eps_micro >= 0 && r.eps_micro <= capMicro - s
        if (ok) s += r.eps_micro
        DpVerdict(consumer, r.release_id, r.mechanism, r.eps_micro, s,
          admitted = ok, duplicate = false)
      }
    }
    spent.update(s)
    lastId.update(hi)
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
