package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
