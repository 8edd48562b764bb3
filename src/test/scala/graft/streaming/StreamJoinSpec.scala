package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Stream-stream inner join with watermarks and a time-bound condition —
  * the attribution-join shape (purchase within 1 hour of a click). Both
  * sides carry watermarks so the join state is bounded: Spark can drop
  * click state older than the watermark minus the bound, which is what
  * makes the join runnable forever at scale.
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("purchase attributes to a click within the time bound; stale clicks don't match") {
    val clickDir = Files.createTempDirectory("clicks")
    val buyDir   = Files.createTempDirectory("buys")
    val clicks = spark.readStream.schema("user_id LONG, click_ts TIMESTAMP")
      .option("header", "true").csv(clickDir.toString)
      .withWatermark("click_ts", "2 hours")
    val buys = spark.readStream.schema("user_id LONG, buy_ts TIMESTAMP")
      .option("header", "true").csv(buyDir.toString)
      .withWatermark("buy_ts", "2 hours")

    val joined = clicks.join(buys,
      clicks("user_id") === buys("user_id") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(clicks("user_id").as("user_id"), col("click_ts"), col("buy_ts"))

    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckj").toString)
      .start()
    try {
      Files.writeString(clickDir.resolve("c1.csv"),
        """user_id,click_ts
          |1,2024-01-01 10:00:00
          |2,2024-01-01 08:00:00
          |""".stripMargin)
      Files.writeString(buyDir.resolve("b1.csv"),
        """user_id,buy_ts
          |1,2024-01-01 10:30:00
          |2,2024-01-01 11:00:00
          |""".stripMargin)
      q.processAllAvailable()

      // advance the watermark far past the morning (22:00 - 2h = 20:00
      // event-time watermark once processed)
      Files.writeString(clickDir.resolve("c2.csv"),
        "user_id,click_ts\n5,2024-01-01 22:00:00\n")
      Files.writeString(buyDir.resolve("b2.csv"),
        "user_id,buy_ts\n5,2024-01-01 22:10:00\n")
      q.processAllAvailable()

      // this pair WOULD match by predicate, but both events are far
      // older than the watermark: state for them was evicted / input
      // dropped, so no row may appear
      Files.writeString(clickDir.resolve("c3.csv"),
        "user_id,click_ts\n9,2024-01-01 09:00:00\n")
      Files.writeString(buyDir.resolve("b3.csv"),
        "user_id,buy_ts\n9,2024-01-01 09:10:00\n")
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("attrib").select("user_id").collect().map(_.getLong(0)).toSet
    // user 1: buy 30 min after click -> attributed; user 2: 3 h later ->
    // not; user 5: in-window pair after watermark advance -> attributed;
    // user 9: would-match pair behind the watermark -> dropped
    assert(got == Set(1L, 5L))
  }
}
