package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The streaming repetition gate must verdict arrivals EXACTLY as the
  * batch filter does (shared verdict expressions, stateless row-local
  * projection), a planted degenerate document must be refused in its
  * arrival micro-batch, and clean long documents must pass.
  */
class StreamingRepGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream verdicts equal batch verdicts; degenerate doc refused in-batch") {
    import spark.implicits._
    val clean = (1 to 60).map(i => s"w$i").mkString(" ")
    val loops = "a b c d e\na b c d e\na b c d e\na b c d e"
    val arrivals = Seq((1L, clean), (2L, loops), (3L, clean + " tail"))

    val in = Files.createTempDirectory("repgate")
    val raw = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(in.toString)
    val q = StreamingRepGate.gate(raw)
      .writeStream.format("memory").queryName("repgate_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("repck").toString)
      .start()
    try {
      for (chunk <- arrivals.grouped(2)) {
        chunk.toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(in.toString)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("repgate_out").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(streamed.size == arrivals.size)
    assert(streamed(1L) == ((true, 0L, "")))
    assert(!streamed(2L)._1 && streamed(2L)._3 == "dup_line_frac")
    assert(streamed(3L)._1)

    // batch parity: the same gate over the same frame
    val batch = StreamingRepGate.gate(arrivals.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(streamed == batch, "stream and batch must verdict identically")
  }

  test("the gate plan is stateless: no aggregation, no watermark required") {
    import spark.implicits._
    // a stateful plan would refuse append mode without a watermark; the
    // gate starting (and completing) in append mode IS the property
    val df = StreamingRepGate.gate(Seq((1L, "x y z")).toDF("doc_id", "text"))
    assert(df.columns.toSeq ==
      Seq("doc_id", "keep", "n_violations", "first_violation",
        "top2_frac", "dup_line_frac"))
  }
}
