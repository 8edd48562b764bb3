package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.ScaleQueries

/** Build-batch / probe-stream for the near-dup ledger: arrivals
  * streamed through [[StreamingLedgerProbe]] must find EXACTLY the
  * verified (batch_id, hist_id, jaccard_sim) pairs the batch
  * `dedup_ledger_probe` finds, across micro-batch boundaries — the
  * row-local signature/verify rewrite computes the same values as the
  * batch explode+groupBy pipeline (this equality is also the desync
  * guard on the shared constants). The per-band at-least-once
  * delivery dedups to the batch answer.
  */
class StreamingLedgerProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed admissions equal the batch probe, across micro-batches") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (buckets, histGrams) = ScaleQueries.ledgerStaticSides(spark, dir)

    val expected = ScaleQueries.dedupLedgerProbe(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty)

    val batch = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 === 3)
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (half1, half2) = batch.splitAt(batch.length / 2)

    val in = Files.createTempDirectory("sledger")
    val raw = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(in.toString)
    val q = StreamingLedgerProbe.score(raw, buckets, histGrams, threshold = 0.5)
      .writeStream.format("memory").queryName("sledger_hits")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sledgerck").toString)
      .start()
    try {
      for (chunk <- Seq(half1, half2)) {
        chunk.toSeq.toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(in.toString)
        q.processAllAvailable()
      }
    } finally q.stop()

    val rows = spark.table("sledger_hits")
      .select("batch_id", "hist_id", "jaccard_sim")
      .as[(Long, Long, Double)].collect()
    assert(rows.toSet == expected,
      s"stream ${rows.toSet} != batch $expected")
    // at-least-once per band: a pair colliding in several bands may be
    // re-emitted, but always with the identical verified jaccard
    val byPair = rows.groupBy(r => (r._1, r._2))
    for ((_, vs) <- byPair) assert(vs.map(_._3).distinct.length == 1)
  }
}
