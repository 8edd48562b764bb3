package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Event-time timer semantics of the liveness monitor: a quiet source
  * alerts once the watermark passes its deadline; a source that keeps
  * delivering never alerts (its timer keeps moving).
  */
class SourceLivenessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("quiet source alerts when the watermark crosses last_seen + gap; " +
       "active source never does") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = Files.createTempDirectory("live")
    val raw = spark.readStream.schema("source STRING, ts_ms LONG")
      .option("header", "true").csv(dir.toString)
      .select(col("source"), timestamp_millis(col("ts_ms")).as("event_time"))
      .withWatermark("event_time", "0 seconds")
    val out = SourceLiveness(raw.as[IngestIn], gapMs = 1000L)
    val query = out.writeStream.format("memory").queryName("liveness")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("lck").toString)
      .start()
    try {
      // batch 1: A and B both alive at t=1000
      Files.writeString(dir.resolve("b1.csv"),
        "source,ts_ms\nA,1000\nB,1000\n")
      query.processAllAvailable()
      assert(spark.table("liveness").count() == 0)

      // batch 2: only B delivers (t=1500) -> watermark 1500, nobody's
      // deadline (A: 2000, B: 2500) crossed yet
      Files.writeString(dir.resolve("b2.csv"), "source,ts_ms\nB,1500\n")
      query.processAllAvailable()
      assert(spark.table("liveness").count() == 0)

      // batch 3: B delivers at t=4000 -> watermark jumps past A's 2000
      // deadline; A alerts, B's own deadline moved to 5000
      Files.writeString(dir.resolve("b3.csv"), "source,ts_ms\nB,4000\n")
      query.processAllAvailable()
      // timers fire on the NEXT microbatch after the watermark advances;
      // push one more heartbeat to flush
      Files.writeString(dir.resolve("b4.csv"), "source,ts_ms\nB,4100\n")
      query.processAllAvailable()
      val alerts = spark.table("liveness").as[StallOut].collect().toList
      assert(alerts == List(StallOut("A", 1000L, 2000L)))
    } finally {
      query.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
