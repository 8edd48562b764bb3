package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.ScaleQueries

/** The ledger append lifecycle: keys appended from a stream must be
  * row-identical to a cold batch recode of the same arrivals (frozen
  * deterministic keys — the compaction-by-concatenation argument), and
  * an appended document must be FINDABLE by a subsequent probe through
  * base ∪ delta, which is the whole point: today's admitted arrivals
  * are tomorrow's history without re-signaturing the corpus.
  */
class StreamingLedgerMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("appended arrivals equal a cold recode and are probe-able as history") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (base, histGrams) = ScaleQueries.ledgerStaticSides(spark, dir)

    // one arrival copying a history doc's text, one brand-new doc
    val histText = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 =!= 3 && length(col("text")) > 80)
      .orderBy("doc_id").select("text").head().getString(0)
    val arrivals = Seq((900001L, histText),
      (900002L, "a genuinely novel arrival about zebra calibration routines"))

    val in = Files.createTempDirectory("sledgapp")
    val deltaDir = Files.createTempDirectory("sledgdelta").toString
    val raw = spark.readStream.schema("doc_id LONG, text STRING")
      .parquet(in.toString)
    val q = StreamingLedgerMaintenance.writer(
        StreamingLedgerMaintenance.keyStream(raw), deltaDir,
        Files.createTempDirectory("sledgappck").toString)
      .start()
    try {
      arrivals.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(in.toString)
      q.processAllAvailable()
    } finally q.stop()

    val delta = StreamingLedgerMaintenance.deltaBuckets(spark, deltaDir, base)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("key"), col("band").cast("int"), col("kb").cast("long"))
        .as[(Long, String, Int, Long)].collect().toSet
    // cold recode equality: the streamed keys are the batch keys
    val cold = rows(StreamingLedgerMaintenance.keyStream(
      arrivals.toDF("doc_id", "text")))
    assert(rows(delta) == cold && cold.nonEmpty)

    // the appended copy is now probe-able history through base ∪ delta
    val probeDoc = Seq((950001L, histText)).toDF("doc_id", "text")
    val histGrams2 = histGrams.unionByName(
      arrivals.toDF("doc_id", "text")
        .select(col("doc_id").as("hist_id"),
          ScaleQueries.kmGramArray(col("text")).as("h_grams")))
    val hits = StreamingLedgerProbe.score(probeDoc,
        base.unionByName(delta), histGrams2, threshold = 0.5)
      .select("hist_id", "jaccard_sim")
      .as[(Long, Double)].collect().toSet
    assert(hits.contains((900001L, 1.0)), hits) // found via the DELTA segment
  }
}
