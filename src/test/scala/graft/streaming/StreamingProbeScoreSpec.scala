package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Logistic
import graft.queries.ScaleQueries

/** Train-batch / score-stream for the text quality probe: the frozen
  * model extracted from the batch pipeline must score a stream
  * ROUND-6-IDENTICALLY to the batch pipeline itself, doc for doc —
  * the row-local feature rewrite (no explode, no groupBy, stateless)
  * computes the exact same values, across micro-batch boundaries.
  */
class StreamingProbeScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed scores equal the batch pipeline's, across micro-batches") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // the model carries its own bucket count (TpBuckets travels INSIDE
    // ProbeModel) — a constant change in the batch pipeline can no
    // longer desync the frozen scorer's hashing from the training run
    val model = ScaleQueries.textProbeModel(spark, dir)

    // batch truth: the full explode+groupBy pipeline, same constants
    val batch = ScaleQueries.textProbeFeatures(spark, dir)
      .select(col("doc_id"), round(Logistic.prob(model.weights.toSeq), 6).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (half1, half2) = docs.splitAt(20)

    val in = Files.createTempDirectory("sprobe")
    val raw = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(in.toString)
    val q = StreamingProbeScore.score(raw, model)
      .writeStream.format("memory").queryName("sprobe_scores")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sprobeck").toString)
      .start()
    try {
      for (chunk <- Seq(half1, half2)) {
        chunk.toSeq.toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(in.toString)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("sprobe_scores")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed.keySet == docs.map(_._1).toSet)
    for ((id, p) <- streamed)
      assert(p == batch(id), s"doc $id: stream $p != batch ${batch(id)}")
  }
}
