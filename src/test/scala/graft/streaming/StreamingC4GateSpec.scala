package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The streaming C4 gate must verdict arrivals EXACTLY as the batch
  * core does on real newline-split lines: a lorem-ipsum page is killed
  * in its arrival micro-batch with the right reason, a javascript line
  * is stripped without killing its page, and a clean multi-sentence
  * page passes with the expected cleaned-text witness.
  */
class StreamingC4GateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("stream verdicts equal batch; page rules and line rules fire in-batch") {
    import spark.implicits._
    val clean = Seq(
      "the first sentence has plenty of words.",
      "the second sentence also has plenty.",
      "and a third one closes the page.").mkString("\n")
    val loremPage = clean + "\nthis page contains lorem ipsum sadly."
    val jsLine = Seq(
      "the first sentence has plenty of words.",
      "a javascript line gets dropped right here.",
      "the second sentence also has plenty.",
      "and a third one closes the page.").mkString("\n")
    val arrivals = Seq((1L, clean), (2L, loremPage), (3L, jsLine))

    val in = Files.createTempDirectory("c4gate")
    val raw = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(in.toString)
    val q = StreamingC4Gate.gate(raw)
      .writeStream.format("memory").queryName("c4gate_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("c4ck").toString)
      .start()
    try {
      for (chunk <- arrivals.grouped(2)) {
        chunk.toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(in.toString)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("c4gate_out").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4), r.getString(5),
          r.getString(6)))).toMap
    assert(streamed.size == arrivals.size)
    assert(streamed(1L) == ((3L, 3L, true, "", md5hex(clean))))
    val (nl2, kl2, keep2, why2, _) = streamed(2L)
    assert(nl2 == 4L && kl2 == 4L && !keep2 && why2 == "lorem_ipsum")
    // javascript line stripped at line level; page survives with 3 kept
    assert(streamed(3L) == ((4L, 3L, true, "", md5hex(clean))))

    // batch parity through the same gate
    val batch = StreamingC4Gate.gate(arrivals.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4), r.getString(5),
          r.getString(6)))).toMap
    assert(streamed == batch, "stream and batch must verdict identically")
  }
}
