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
}
