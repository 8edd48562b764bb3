package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.etl.{MailSource, RenderMail}
import graft.send.{OutgoingMail, SendPolicy, SendResult, SmtpSink, TransportFactory}

/** Structured-Streaming rendition of the send queue (SURVEY.md §2.9):
  * the reference's rate-limited sequential loop becomes
  * file-source → dialect-normalize → render → foreachBatch(SmtpSink),
  * with the 1 s throttle expressed as the trigger cadence plus the
  * sink-side pacing.
  *
  * Delivery semantics: with a `ledgerDir`, every micro-batch anti-joins
  * its arrivals against the persisted `SendResult` ledger before
  * delivering ([[SmtpSink.sendAllDeduped]]'s batch contract lifted into
  * streaming) and appends its own status frame to the ledger — so a
  * restart (even one that replays the whole source, e.g. a fresh
  * checkpoint) is EFFECTIVELY-ONCE per recipient across runs, and the
  * delivery status the reference logs to its UI (`app.py:328-377`) is
  * durable on disk instead of discarded. The residual exposure is a
  * crash INSIDE a batch job before its ledger commit (parquet commits
  * at job granularity): those sends replay — the same ambiguous-failure
  * at-least-once window the reference's retry loop has
  * (`app.py:363-375`). Without a ledger the path keeps plain
  * at-least-once reference parity.
  */
object SendQueueStream {

  /** Normalize + render a (possibly streaming) dialect frame. */
  def renderStream(raw: DataFrame, courseName: String, aulaUrl: String): DataFrame =
    RenderMail(MailSource.normalize(raw), courseName, aulaUrl)

  /** The accumulated delivery ledger at `dir` — the `status = 'sent'`
    * rows of every prior batch/run, as the anti-join side. Explicit
    * schema so a not-yet-created or empty ledger reads as an empty
    * frame instead of failing inference.
    */
  def sentLedger(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val schema = implicitly[org.apache.spark.sql.Encoder[SendResult]].schema
    val df =
      if (new java.io.File(dir).exists())
        spark.read.schema(schema).parquet(dir)
      else spark.emptyDataset[SendResult].toDF()
    df.filter(col("status") === "sent")
  }

  /** Build the streaming writer. Each micro-batch is ordinal-numbered
    * within the batch; with `ledgerDir` set, already-sent recipients
    * are excluded and the batch's `SendResult` frame is appended to
    * the ledger IN the same job that performs the sends (writing the
    * status frame is the action that drives the transport).
    */
  def writer(spark: SparkSession, rendered: DataFrame, factory: TransportFactory,
             policy: SendPolicy = SendPolicy(),
             triggerMillis: Long = 1000L,
             ledgerDir: Option[String] = None): DataStreamWriter[org.apache.spark.sql.Row] = {
    import spark.implicits._
    rendered.writeStream
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val mails = SmtpSink.withOrdinals(batch, "email")
          .select(col("idx"), col("total"), col("email"), col("nombre"),
            col("subject"), col("plain_body"), col("html_body"))
          .as[OutgoingMail]
        ledgerDir match {
          case Some(dir) =>
            SmtpSink.sendAllDeduped(mails, factory, sentLedger(spark, dir),
                keyCol = "email", policy)
              .write.mode("append").parquet(dir)
          case None =>
            SmtpSink.sendAll(mails, factory, policy).collect()
        }
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
