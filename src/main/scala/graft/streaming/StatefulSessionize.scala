package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class EventIn(user_id: Long, ts_us: Long)
final case class EventTimed(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
final case class SessState(start_us: Long, last_us: Long, n: Int)
final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

/** Stateful streaming sessionization via `flatMapGroupsWithState`: the
  * custom-state sibling of the batch `Relational.sessionize`. State per
  * user is one open session (constant size); a session is EMITTED when a
  * later event arrives past the gap, so output mode is Append.
  *
  * State never grows with history — the 100 TB/stream-forever property —
  * and the group iterator is sorted before folding so intra-batch order
  * doesn't depend on shuffle arrival.
  */
object StatefulSessionize {

  /** One micro-batch's fold: sorted events merged into the open session,
    * emitting every session a gap-crossing closes. Shared by both the
    * timeout-free and the event-time-timeout renditions.
    */
  private def fold(user: Long, sorted: Seq[(Long)], prior: Option[SessState],
                   gapUs: Long): (Seq[SessionOut], Option[SessState]) = {
    val closed = Seq.newBuilder[SessionOut]
    var open   = prior
    sorted.foreach { ts =>
      open = open match {
        // distance to the nearest session edge: a late event inside
        // [start, last] or within the gap of either edge joins the
        // session WITHOUT regressing last_us (or it would distort
        // every later gap measurement)
        case Some(s) if ts >= s.start_us - gapUs && ts <= s.last_us + gapUs =>
          Some(SessState(math.min(s.start_us, ts), math.max(s.last_us, ts), s.n + 1))
        case Some(s) if ts > s.last_us =>
          closed += SessionOut(user, s.start_us, s.last_us, s.n)
          Some(SessState(ts, ts, 1))
        case Some(s) =>
          // stale straggler older than start-gap: too late to
          // attribute, count it as its own (already-closed) session
          closed += SessionOut(user, ts, ts, 1)
          Some(s)
        case None =>
          Some(SessState(ts, ts, 1))
      }
    }
    (closed.result(), open)
  }

  def apply(events: Dataset[EventIn], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[EventIn], state: GroupState[SessState]) =>
          val (closed, open) =
            fold(user, batch.toSeq.map(_.ts_us).sorted, state.getOption, gapUs)
          open.foreach(state.update)
          closed.iterator
      }
  }

  /** Event-time-timeout rendition: when the WATERMARK passes an open
    * session's gap horizon, the session is emitted and its state
    * REMOVED — idle keys cost nothing forever after, which is the
    * property that keeps unbounded-key streams (the 100 TB shape)
    * at constant state. `apply` above only closes a session when the
    * same user shows up again; this closes it on quiescence.
    *
    * @param events frame with `user_id` and epoch-micros `ts_us`
    * @param watermarkDelay how much event-time lateness to tolerate
    *                       before the horizon advances (e.g. "2 seconds")
    */
  def withEventTimeTimeout(events: DataFrame, gapUs: Long,
                           watermarkDelay: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts_us"), col("ts"))
      .as[EventTimed]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[EventTimed], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(s => SessionOut(user, s.start_us, s.last_us, s.n))
            state.remove()
            out.iterator
          } else {
            val (closed, open) =
              fold(user, batch.toSeq.map(_.ts_us).sorted, state.getOption, gapUs)
            open.foreach { s =>
              state.update(s)
              // fire once the watermark passes last + gap (ms clock;
              // clamped: Spark rejects timeouts at/behind the watermark)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs + 1, (s.last_us + gapUs) / 1000))
            }
            closed.iterator
          }
      }
  }
}
