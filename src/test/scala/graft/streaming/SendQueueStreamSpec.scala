package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.send.{FakeTransport, RecordingFactory, SendPolicy}

class SendQueueStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file-source stream normalizes, renders and delivers each micro-batch") {
    val dir = Files.createTempDirectory("mailq")
    val schema = "email STRING, nombre STRING, usuario STRING, contrasena STRING"
    val raw = spark.readStream.schema(schema)
      .option("header", "true").csv(dir.toString)
    val rendered = SendQueueStream.renderStream(raw, "Curso X", "https://aula/")

    FakeTransport.reset()
    val query = SendQueueStream.writer(spark, rendered, new RecordingFactory,
      SendPolicy(throttleMillis = 0, backoffMillisPerAttempt = 0), triggerMillis = 100L)
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    try {
      Files.writeString(dir.resolve("batch1.csv"),
        "email,nombre,usuario,contrasena\na@x.cl,Ana,u1,p1\nb@x.cl,Bob,u2,p2\n")
      query.processAllAvailable()
      Files.writeString(dir.resolve("batch2.csv"),
        "email,nombre,usuario,contrasena\nc@x.cl,Cleo,u3,p3\n")
      query.processAllAvailable()
    } finally query.stop()

    val sent = FakeTransport.sent.toArray.map(_.toString).toSet
    assert(sent == Set("a@x.cl", "b@x.cl", "c@x.cl"))
  }

  test("ledgered stream is effectively-once across a restart that replays input") {
    val dir = Files.createTempDirectory("mailq2")
    val ledger = Files.createTempDirectory("ledger").resolve("sent").toString
    val schema = "email STRING, nombre STRING, usuario STRING, contrasena STRING"
    def startQuery() = {
      val raw = spark.readStream.schema(schema)
        .option("header", "true").csv(dir.toString)
      SendQueueStream.writer(spark,
          SendQueueStream.renderStream(raw, "Curso X", "https://aula/"),
          new RecordingFactory,
          SendPolicy(throttleMillis = 0, backoffMillisPerAttempt = 0),
          triggerMillis = 100L, ledgerDir = Some(ledger))
        // FRESH checkpoint each start: forces the file source to replay
        // EVERYTHING — the harshest restart, where checkpoint-based
        // exactly-once gives no protection and only the ledger can
        .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
        .start()
    }
    FakeTransport.reset()
    val q1 = startQuery()
    try {
      Files.writeString(dir.resolve("batch1.csv"),
        "email,nombre,usuario,contrasena\na@x.cl,Ana,u1,p1\nb@x.cl,Bob,u2,p2\n")
      q1.processAllAvailable()
    } finally q1.stop()
    assert(FakeTransport.sent.toArray.map(_.toString).toSet == Set("a@x.cl", "b@x.cl"))
    val afterRun1 = spark.read.parquet(ledger)
    assert(afterRun1.filter(col("status") === "sent").count() == 2)

    // restart with a new checkpoint (full source replay) + one new mail:
    // only the new recipient may reach the transport
    FakeTransport.reset()
    val q2 = startQuery()
    try {
      Files.writeString(dir.resolve("batch2.csv"),
        "email,nombre,usuario,contrasena\nc@x.cl,Cleo,u3,p3\n")
      q2.processAllAvailable()
    } finally q2.stop()
    assert(FakeTransport.sent.toArray.map(_.toString).toSet == Set("c@x.cl"),
      "replayed recipients must be anti-joined away by the ledger")
    val afterRun2 = spark.read.parquet(ledger)
    assert(afterRun2.filter(col("status") === "sent")
      .select("email").distinct().count() == 3)
  }

  test("watermarked tumbling window aggregates event-time buckets") {
    val dir = Files.createTempDirectory("events")
    Files.writeString(dir.resolve("e1.csv"),
      """ts,event_type
        |2024-01-01 00:10:00,click
        |2024-01-01 00:20:00,click
        |2024-01-01 01:10:00,view
        |""".stripMargin)
    val raw = spark.readStream.schema("ts TIMESTAMP, event_type STRING")
      .option("header", "true").csv(dir.toString)
    val agg = SendQueueStream.windowedEventCounts(raw, "1 hour", "2 hours")

    val query = agg.writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    try query.processAllAvailable() finally query.stop()

    val rows = spark.table("wincounts")
      .select(col("window.start").cast("string"), col("event_type"), col("n_events"))
      .as[(String, String, Long)](org.apache.spark.sql.Encoders.product[(String, String, Long)])
      .collect().toSet
    assert(rows == Set(
      ("2024-01-01 00:00:00", "click", 2L),
      ("2024-01-01 01:00:00", "view", 1L)))
  }
}
