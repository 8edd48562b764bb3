package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

final case class IngestIn(source: String, event_time: java.sql.Timestamp)
final case class StallOut(source: String, last_seen_ms: Long, stalled_at_ms: Long)

/** Source-liveness monitor on `transformWithState` EVENT-TIME TIMERS —
  * the other half of the Spark 4 arbitrary-state API
  * ([[StreamingQuota]] covers ValueState; this covers
  * registerTimer/handleExpiredTimer): every batch a source is seen, its
  * previous timer is replaced with one at (max event time + gap); when
  * the WATERMARK crosses a timer that no new data refreshed, the source
  * has gone quiet and a stall alert row is emitted — the "producer
  * died" page for a continuously-ingesting pipeline.
  *
  * State per source is one long + one timer — constant, stream-forever
  * safe. Emission is driven by watermark advancement (deterministic in
  * tests), not wall-clock.
  */
class LivenessProcessor(gapMs: Long)
    extends StatefulProcessor[String, IngestIn, StallOut] {

  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(source: String, rows: Iterator[IngestIn],
                               timers: TimerValues): Iterator[StallOut] = {
    val maxTs = rows.map(_.event_time.getTime).max
    val prev = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
    if (maxTs > prev) {
      if (prev != Long.MinValue) getHandle.deleteTimer(prev + gapMs)
      lastSeen.update(maxTs)
      getHandle.registerTimer(maxTs + gapMs)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(source: String, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[StallOut] = {
    val seen = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
    // stale timer from an out-of-order refresh: only the CURRENT
    // deadline may alert
    if (seen != Long.MinValue && expired.getExpiryTimeInMs == seen + gapMs)
      Iterator.single(StallOut(source, seen, expired.getExpiryTimeInMs))
    else Iterator.empty
  }
}

object SourceLiveness {
  /** `events` must carry a watermark on `event_time` — timers fire off
    * watermark advancement.
    */
  def apply(events: Dataset[IngestIn], gapMs: Long): Dataset[StallOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.source)
      .transformWithState(new LivenessProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
