package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Differentially-private telemetry release at STREAM time: the
  * streaming sibling of the batch `dp_release` histogram (same Laplace
  * counting mechanism, same seeded inverse-CDF noise), for the
  * pipelines that must publish per-window arrival counts (ops
  * dashboards, partner feeds) without exposing exact per-group
  * traffic.
  *
  * Shape: exactly one stateful operator — the watermarked tumbling
  * window × group COUNT (watermark-bounded state, append output) —
  * then the noise folds ROW-LOCALLY over each aggregated row, seeded
  * by md5(group, window_start): deterministic, replayable across
  * restarts (a checkpoint replay of the same window re-emits the SAME
  * release — an RNG draw would leak a second sample of the true count,
  * silently doubling the spent budget).
  *
  * Budget accounting (the scaladoc contract the spec pins): one event
  * lands in exactly ONE (group, window) cell, so within a window the
  * groups compose in PARALLEL — ε = [[Eps]] per window total; across
  * windows budgets add (sequential composition over disjoint event
  * sets is still ε per event's one window — a user contributing events
  * to w windows is protected at w·ε, the standard streaming-DP
  * user-level caveat, stated rather than hidden).
  */
object StreamingDpRelease {

  /** Per-window privacy budget of the released count stream. */
  val Eps = 1.0

  /** The seeded uniform for one (group, window_start) cell — md5-
    * derived, the `bootstrap_ci`/`dp_release` discipline. window_start
    * enters as epoch SECONDS so the seed is timezone-free.
    */
  private def cellU(group: Column, winStart: Column): Column =
    (conv(substring(md5(concat_ws("_", lit("dpw"), group,
      winStart.cast("long"))), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)

  /** Laplace(1/ε) inverse-CDF transform of a uniform. */
  private def laplace(u: Column): Column =
    -lit(1.0 / Eps) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))

  /** Windowed DP count release of a (ts, `groupCol`) stream. Works on
    * a batch frame too (withWatermark is a no-op there) — the spec's
    * parity path. Emits the noisy count and the nonneg-integer
    * post-processed release (free under DP).
    */
  def release(events: DataFrame, groupCol: String,
              windowLen: String, watermark: String): DataFrame = {
    val h = events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col(groupCol))
      .agg(count(lit(1)).as("n"))
    val noise = laplace(cellU(col(groupCol), col("window.start")))
    h.select(col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      col(groupCol),
      lit(Eps).as("epsilon"),
      round(col("n") + noise, 4).as("noisy_count"),
      greatest(round(col("n") + noise, 0), lit(0.0)).cast("long").as("released"))
  }

  /** [[release]] with the [[StreamingDpBudget]] accountant wired in
    * front of the emit path (SURVEY §9.5's remaining step): each
    * finalized window is ONE release costing [[Eps]] (groups within a
    * window compose in parallel — see the budget contract above), and a
    * window that would overshoot `capMicro` emits NO released values —
    * only a single visible refusal row (`admitted = false`, null group
    * and counts) — and spends nothing. Spend lives in the same
    * RocksDB-durable two-long state as the standalone accountant, so a
    * checkpoint replay cannot double-spend: replaying a micro-batch
    * rolls the store back to the pre-batch version, and a source that
    * REDELIVERS an already-answered window in a later batch gets a
    * spend-free `duplicate` marker row instead of a second admit
    * (window_start is the monotone release id — append-mode windows
    * finalize in event-time order, which is what makes that contract
    * hold for free here).
    */
  def releaseGated(events: DataFrame, groupCol: String, windowLen: String,
                   watermark: String, consumer: String,
                   capMicro: Long): Dataset[DpGatedCell] = {
    import events.sparkSession.implicits._
    val epsMicro = math.round(Eps * 1e6)
    release(events, groupCol, windowLen, watermark)
      .select(col("window_start"), col("window_end"),
        col(groupCol).as("group"), col("epsilon"),
        col("noisy_count"), col("released"))
      .as[DpWindowCell]
      .groupByKey(_ => consumer)
      .transformWithState(new DpGateProcessor(capMicro, epsMicro),
        TimeMode.None(), OutputMode.Append())
  }
}

/** One finalized (window, group) cell of the ungated release. */
final case class DpWindowCell(window_start: Timestamp, window_end: Timestamp,
                              group: String, epsilon: Double,
                              noisy_count: Double, released: Long)

/** A gated release row. Admitted windows re-emit their cells with the
  * accounting attached; a refused window collapses to ONE row with null
  * group/noisy_count/released (the release never happened — emitting
  * the would-be values would BE the privacy spend); a redelivered
  * window collapses to one spend-free `duplicate` row.
  */
final case class DpGatedCell(consumer: String, window_start: Timestamp,
                             window_end: Timestamp, group: Option[String],
                             epsilon: Double, noisy_count: Option[Double],
                             released: Option[Long], admitted: Boolean,
                             duplicate: Boolean, spent_after: Long)

/** The emit gate: [[DpBudgetProcessor]]'s accounting rule applied to
  * whole windows of release cells. State per consumer is two longs
  * (micro-ε spent + last answered window id), RocksDB-durable.
  */
class DpGateProcessor(capMicro: Long, epsMicro: Long)
    extends StatefulProcessor[String, DpWindowCell, DpGatedCell] {

  @transient private var spent: ValueState[Long] = _
  @transient private var lastWin: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    spent = getHandle.getValueState[Long]("spent", Encoders.scalaLong, TTLConfig.NONE)
    lastWin = getHandle.getValueState[Long]("lastWin", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(consumer: String, rows: Iterator[DpWindowCell],
                               timers: TimerValues): Iterator[DpGatedCell] = {
    var s = if (spent.exists()) spent.get() else 0L
    var hi = if (lastWin.exists()) lastWin.get() else Long.MinValue
    val out = rows.toSeq.groupBy(_.window_start).toSeq.sortBy(_._1.getTime)
      .flatMap { case (ws, cells) =>
        val winId = ws.getTime
        val head = cells.head
        if (winId <= hi) {
          Seq(DpGatedCell(consumer, ws, head.window_end, None, head.epsilon,
            None, None, admitted = false, duplicate = true, spent_after = s))
        } else {
          hi = winId
          // Overflow-safe: s ∈ [0, capMicro] ⇒ capMicro - s never wraps.
          val ok = epsMicro <= capMicro - s
          if (ok) {
            s += epsMicro
            cells.sortBy(_.group).map(c =>
              DpGatedCell(consumer, ws, c.window_end, Some(c.group), c.epsilon,
                Some(c.noisy_count), Some(c.released), admitted = true,
                duplicate = false, spent_after = s))
          } else {
            Seq(DpGatedCell(consumer, ws, head.window_end, None, head.epsilon,
              None, None, admitted = false, duplicate = false, spent_after = s))
          }
        }
      }
    spent.update(s)
    lastWin.update(hi)
    out.iterator
  }
}
