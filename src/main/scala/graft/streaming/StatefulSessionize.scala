package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class EventIn(user_id: Long, ts_us: Long)
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

  def apply(events: Dataset[EventIn], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[EventIn], state: GroupState[SessState]) =>
          val closed = Seq.newBuilder[SessionOut]
          var open   = state.getOption
          batch.toSeq.sortBy(_.ts_us).foreach { e =>
            open = open match {
              // distance to the nearest session edge: a late event inside
              // [start, last] or within the gap of either edge joins the
              // session WITHOUT regressing last_us (or it would distort
              // every later gap measurement)
              case Some(s) if e.ts_us >= s.start_us - gapUs && e.ts_us <= s.last_us + gapUs =>
                Some(SessState(math.min(s.start_us, e.ts_us),
                  math.max(s.last_us, e.ts_us), s.n + 1))
              case Some(s) if e.ts_us > s.last_us =>
                closed += SessionOut(user, s.start_us, s.last_us, s.n)
                Some(SessState(e.ts_us, e.ts_us, 1))
              case Some(s) =>
                // stale straggler older than start-gap: too late to
                // attribute, count it as its own (already-closed) session
                closed += SessionOut(user, e.ts_us, e.ts_us, 1)
                Some(s)
              case None =>
                Some(SessState(e.ts_us, e.ts_us, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
