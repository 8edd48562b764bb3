package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The streaming quality gate must verdict arrivals EXACTLY as the
  * batch filter does (shared verdict expressions, stateless row-local
  * projection): a planted low-quality document is refused in its
  * arrival micro-batch, clean long documents pass.
  */
class StreamingCleanGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream verdicts equal batch verdicts; low-quality doc refused in-batch") {
    import spark.implicits._
    val clean = ((1 to 48).map(i => s"word$i") ++
      Seq("the", "with", "and", "that")).mkString(" ")
    val shortDoc = "the and too short."
    val arrivals = Seq((1L, clean), (2L, shortDoc), (3L, clean + " more"))

    val in = Files.createTempDirectory("cleangate")
    val raw = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(in.toString)
    val q = StreamingCleanGate.gate(raw)
      .writeStream.format("memory").queryName("cleangate_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("cleanck").toString)
      .start()
    try {
      for (chunk <- arrivals.grouped(2)) {
        chunk.toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(in.toString)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("cleangate_out").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(streamed.size == arrivals.size)
    assert(streamed(1L) == ((true, 0L, "")))
    assert(!streamed(2L)._1 && streamed(2L)._3 == "word_count")
    assert(streamed(3L)._1)

    // batch parity: the same gate over the same frame
    val batch = StreamingCleanGate.gate(arrivals.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(streamed == batch, "stream and batch must verdict identically")
  }

  test("the gate plan is stateless: starts in append mode, fixed columns") {
    import spark.implicits._
    val df = StreamingCleanGate.gate(Seq((1L, "x y z")).toDF("doc_id", "text"))
    assert(df.columns.toSeq ==
      Seq("doc_id", "keep", "n_violations", "first_violation",
        "n_words", "alpha_word_frac"))
  }
}
