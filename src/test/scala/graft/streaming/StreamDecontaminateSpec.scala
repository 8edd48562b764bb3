package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.TextAnalysis

/** Streaming decontamination: the continuous-ingest rendition of the
  * batch `decontaminate` query — a stream-STATIC anti join against the
  * eval-set fingerprint list. The static side broadcasts once; each
  * micro-batch filters map-side with no stream-side state at all (unlike
  * stream-stream joins), which is why this shape scales to an unbounded
  * ingest feed at 100 TB: the contamination list is model-parameter
  * sized, the stream never shuffles.
  */
class StreamDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("contaminated docs are dropped across micro-batches via stream-static anti join") {
    import spark.implicits._
    val evalSet = Seq("the quick brown fox", "hello world")
      .toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))

    val dir = Files.createTempDirectory("sdecon")
    val raw = spark.readStream.schema("doc_id LONG, text STRING")
      .option("header", "true").csv(dir.toString)
    val clean = raw
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .join(broadcast(evalSet), Seq("fp"), "left_anti")

    val q = clean.writeStream.format("memory").queryName("sdecon")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck4").toString)
      .start()
    try {
      // fingerprint-normalized contamination: case + punctuation differ
      Files.writeString(dir.resolve("b1.csv"),
        "doc_id,text\n1,The Quick Brown Fox!\n2,genuinely novel text\n")
      q.processAllAvailable()
      Files.writeString(dir.resolve("b2.csv"),
        "doc_id,text\n3,hello world\n4,another clean doc\n")
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.table("sdecon").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L), s"got $kept")
  }
}
