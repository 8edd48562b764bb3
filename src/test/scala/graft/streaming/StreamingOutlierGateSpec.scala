package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.ScaleQueries

/** The streaming outlier gate must score arrivals EXACTLY as the
  * batch transform does under the same frozen model (row-local
  * literal fold — no state, no watermark), and a planted far-out
  * vector must flag while the corpus bulk stays quiet.
  */
class StreamingOutlierGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed m2 equals the batch transform; planted outlier flags") {
    import spark.implicits._
    val model = ScaleQueries.whitenModel(spark, dir)

    // arrivals: 20 corpus vectors + one planted far-out vector along v1
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val far = model.mu.zip(model.v1)
      .map { case (m, v) => (m + 40.0 * math.sqrt(model.l1) * v).toFloat }.toSeq
    val arrivals = corpus :+ (999L, far)

    val in = Files.createTempDirectory("sgate")
    val raw = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>").parquet(in.toString)
    val q = StreamingOutlierGate.gate(raw, model)
      .writeStream.format("memory").queryName("sgate_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sgck").toString)
      .start()
    try {
      for (chunk <- arrivals.grouped(7)) {
        chunk.toSeq.toDF("vec_id", "embedding")
          .coalesce(1).write.mode("append").parquet(in.toString)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("sgate_out").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(streamed.size == arrivals.size)

    // batch parity: the same gate over the same frame
    val batch = StreamingOutlierGate.gate(
        arrivals.toSeq.toDF("vec_id", "embedding"), model)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(streamed == batch, "stream and batch must score identically")

    // the planted vector sits ~40 sigma out along v1 -> m2 ~ 1600
    assert(streamed(999L)._2 == 1L && streamed(999L)._1 > 100.0)
    // the corpus bulk is calibrated: a 20-vector sample stays mostly in
    assert(corpus.count(c => streamed(c._1)._2 == 1L) <= 2)
  }
}
