package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.etl.{MailSource, RenderMail}
import graft.send.{OutgoingMail, SendPolicy, SmtpSink, TransportFactory}

/** Structured-Streaming rendition of the send queue (SURVEY.md §2.9):
  * the reference's rate-limited sequential loop becomes
  * file-source → dialect-normalize → render → foreachBatch(SmtpSink),
  * with the 1 s throttle expressed as the trigger cadence plus the
  * sink-side pacing.
  *
  * At-least-once, like the reference: a batch that fails mid-send is
  * replayed on recovery (its retry loop has the same exposure,
  * `app.py:363-375`).
  */
object SendQueueStream {

  /** Normalize + render a (possibly streaming) dialect frame. */
  def renderStream(raw: DataFrame, courseName: String, aulaUrl: String): DataFrame =
    RenderMail(MailSource.normalize(raw), courseName, aulaUrl)

  /** Build the streaming writer. Each micro-batch is ordinal-numbered
    * within the batch and handed to the batch sink.
    */
  def writer(spark: SparkSession, rendered: DataFrame, factory: TransportFactory,
             policy: SendPolicy = SendPolicy(),
             triggerMillis: Long = 1000L): DataStreamWriter[org.apache.spark.sql.Row] = {
    import spark.implicits._
    rendered.writeStream
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val mails = SmtpSink.withOrdinals(batch, "email")
          .select(col("idx"), col("total"), col("email"), col("nombre"),
            col("subject"), col("plain_body"), col("html_body"))
          .as[OutgoingMail]
        SmtpSink.sendAll(mails, factory, policy).collect()
        (): Unit
      }
  }

  /** Watermarked tumbling-window event counts — the streaming agg shape
    * (`events`-table schema) with late-data tolerance.
    */
  def windowedEventCounts(events: DataFrame, window_ : String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
}
