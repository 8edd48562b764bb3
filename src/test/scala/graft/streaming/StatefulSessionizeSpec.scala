package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StatefulSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sessions close when a later event exceeds the gap; state spans micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sess")
    val raw = spark.readStream.schema("user_id LONG, ts_us LONG")
      .option("header", "true").csv(dir.toString)
    val out = StatefulSessionize(raw.as[EventIn], gapUs = 100L)

    val query = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // batch 1: one open session for user 1 (events 10, 50), user 2 opens at 40
      Files.writeString(dir.resolve("b1.csv"), "user_id,ts_us\n1,10\n1,50\n2,40\n")
      query.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // nothing closed yet

      // batch 2: user 1 jumps past the gap -> first session closes;
      // user 2 stays within the gap -> still open
      Files.writeString(dir.resolve("b2.csv"), "user_id,ts_us\n1,500\n2,90\n")
      query.processAllAvailable()
      val closed = spark.table("sessions")
        .as[SessionOut].collect().toSet
      assert(closed == Set(SessionOut(1L, 10L, 50L, 2)))

      // batch 3: both users jump -> both open sessions close
      Files.writeString(dir.resolve("b3.csv"), "user_id,ts_us\n1,10000\n2,10000\n")
      query.processAllAvailable()
      val all = spark.table("sessions").as[SessionOut].collect().toSet
      assert(all == Set(
        SessionOut(1L, 10L, 50L, 2),
        SessionOut(1L, 500L, 500L, 1),
        SessionOut(2L, 40L, 90L, 2)))
    } finally query.stop()
  }

  test("event-time timeout closes idle sessions once the watermark passes the gap") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sess3")
    val raw = spark.readStream.schema("user_id LONG, ts_us LONG")
      .option("header", "true").csv(dir.toString)
    val out = StatefulSessionize.withEventTimeTimeout(
      raw, gapUs = 1000000L, watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("sessions3")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck4").toString)
      .start()
    try {
      // user 1: two events at 10s and 10.5s; session stays open
      Files.writeString(dir.resolve("b1.csv"), "user_id,ts_us\n1,10000000\n1,10500000\n")
      query.processAllAvailable()
      assert(spark.table("sessions3").count() == 0)

      // user 2 at t=100s drives the watermark far past user 1's horizon
      // (11.5s); the NEXT trigger fires user 1's timeout — no user-1
      // event ever arrives again, yet the session closes and its state
      // is evicted
      Files.writeString(dir.resolve("b2.csv"), "user_id,ts_us\n2,100000000\n")
      query.processAllAvailable()
      Files.writeString(dir.resolve("b3.csv"), "user_id,ts_us\n2,101000000\n")
      query.processAllAvailable()
      val closed = spark.table("sessions3").as[SessionOut].collect().toSet
      assert(closed.contains(SessionOut(1L, 10000000L, 10500000L, 2)))
    } finally query.stop()
  }

  test("late cross-batch event joins the open session without regressing its end") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sess2")
    val raw = spark.readStream.schema("user_id LONG, ts_us LONG")
      .option("header", "true").csv(dir.toString)
    val out = StatefulSessionize(raw.as[EventIn], gapUs = 100L)
    val query = out.writeStream.format("memory").queryName("sessions2")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck3").toString)
      .start()
    try {
      Files.writeString(dir.resolve("b1.csv"), "user_id,ts_us\n1,500\n")
      query.processAllAvailable()
      // 480 arrives late (within gap of the open session's span): must
      // extend start backwards, NOT regress last_us — so the following
      // 560 still measures its gap from 500.
      Files.writeString(dir.resolve("b2.csv"), "user_id,ts_us\n1,480\n1,560\n")
      query.processAllAvailable()
      Files.writeString(dir.resolve("b3.csv"), "user_id,ts_us\n1,99999\n")
      query.processAllAvailable()
      val closed = spark.table("sessions2").as[SessionOut].collect().toSet
      assert(closed == Set(SessionOut(1L, 480L, 560L, 3)))
    } finally query.stop()
  }
}
