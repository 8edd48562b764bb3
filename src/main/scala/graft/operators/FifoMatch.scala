package graft.operators

import org.apache.spark.sql.Dataset

/** One event on a user's timeline (input to [[FifoMatch]]). */
final case class TimelineEvent(user_id: Long, event_id: Long, ts_us: Long, kind: String)

/** A matched (view, purchase) pair and the wait between them. */
final case class FifoPair(user_id: Long, view_event: Long, purchase_event: Long, wait_us: Long)

/** FIFO attribution: per user, each purchase consumes the OLDEST not-yet-
  * consumed earlier view — the online queue semantics of order matching /
  * inventory consumption.
  *
  * This is the justified typed-API case (SURVEY §7.3 preference order):
  * the match index of a purchase depends on how many earlier purchases
  * found partners, which is inherently sequential per key — no window or
  * join expresses it (an unmatched purchase shifts every later pairing).
  * `flatMapGroups` holds one user's events; state is a queue bounded by
  * that user's unmatched views. Keys are independent, so the operator
  * scales as ordinary keyed parallelism; a pathologically hot key would
  * take the same salting remedies as any keyed aggregate.
  */
object FifoMatch {

  def pairs(events: Dataset[TimelineEvent]): Dataset[FifoPair] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      // a group fits in memory by the same assumption every
      // mapGroups/collect_list op makes; order restored explicitly
      val sorted = it.toArray.sortBy(e => (e.ts_us, e.event_id))
      val pending = scala.collection.mutable.Queue.empty[TimelineEvent]
      val out = scala.collection.mutable.ArrayBuffer.empty[FifoPair]
      sorted.foreach { e =>
        if (e.kind == "view") pending.enqueue(e)
        else if (e.kind == "purchase" && pending.nonEmpty) {
          val v = pending.dequeue()
          out += FifoPair(uid, v.event_id, e.event_id, e.ts_us - v.ts_us)
        }
      }
      out.iterator
    }
  }
}
