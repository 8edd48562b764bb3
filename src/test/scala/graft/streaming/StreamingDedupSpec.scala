package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.TextAnalysis

/** Streaming exact dedup: dropDuplicates over the content fingerprint,
  * with state carrying across micro-batches (at 100 TB you bound the
  * state with a watermark on arrival time; here unbounded for the spec).
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("duplicate content is suppressed across micro-batches") {
    val dir = Files.createTempDirectory("sdedup")
    val raw = spark.readStream.schema("doc_id LONG, text STRING")
      .option("header", "true").csv(dir.toString)
    val deduped = raw
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .dropDuplicates("fp")

    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck2").toString)
      .start()
    try {
      Files.writeString(dir.resolve("b1.csv"),
        "doc_id,text\n1,hello world\n2,other doc\n")
      q.processAllAvailable()
      // batch 2 repeats doc 1's content (different id + punctuation)
      Files.writeString(dir.resolve("b2.csv"),
        "doc_id,text\n3,hello; world!\n4,brand new\n")
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.table("sdedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L)) // 3 deduped against 1 via fingerprint
  }

  test("watermarked dedup bounds state: dups suppressed in-window, re-admitted after eviction") {
    // The 100 TB shape: dropDuplicatesWithinWatermark keeps only a
    // watermark-wide window of fingerprints in state (unbounded
    // dropDuplicates would OOM on an endless stream). In-window dups are
    // suppressed; once the watermark passes a fingerprint's event time +
    // delay its state is evicted, so a far-later repeat is admitted —
    // that re-admission is the proof the state is actually bounded.
    val dir = Files.createTempDirectory("swdedup")
    val raw = spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING")
      .option("header", "true").csv(dir.toString)
    val deduped = raw
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")

    val q = deduped.writeStream.format("memory").queryName("swdedup")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck3").toString)
      .start()
    try {
      Files.writeString(dir.resolve("b1.csv"),
        "doc_id,ts,text\n1,2024-01-01 10:00:00,hello world\n2,2024-01-01 10:01:00,other doc\n")
      q.processAllAvailable()
      // in-window duplicate (10:05 vs 10:00, delay 10 min) → suppressed;
      // the 12:00 row advances the watermark to 11:50 for the next batch
      Files.writeString(dir.resolve("b2.csv"),
        "doc_id,ts,text\n3,2024-01-01 10:05:00,hello; world!\n4,2024-01-01 12:00:00,fresh doc\n")
      q.processAllAvailable()
      // watermark (11:50) has passed doc 1's expiry (10:00 + 10 min) →
      // its fingerprint state is gone; the repeat is re-admitted
      Files.writeString(dir.resolve("b3.csv"),
        "doc_id,ts,text\n5,2024-01-01 12:30:00,hello world\n")
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.table("swdedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L, 5L), s"got $kept")
  }
}
