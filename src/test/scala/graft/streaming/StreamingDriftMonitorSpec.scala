package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.TextAnalysis

/** Event-time drift monitoring: two tumbling windows — one fed a
  * corpus-representative sample, one fed only bottom-quality documents
  * — streamed across micro-batches with a watermark. The streamed PSI
  * rows must equal an independent driver-side recomputation (plain
  * Scala histogram + PSI over the same planted sets), the skewed
  * window must alert (PSI well above the quiet window), and windows
  * must emit through the append-mode watermark contract.
  */
class StreamingDriftMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("windowed PSI matches a driver recompute; the planted skew alerts") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    val baseline = StreamingDriftMonitor.trainBaseline(corpus)

    // planted arrivals: window A = every 3rd doc (representative),
    // window B = the 25 lowest-quality docs
    val scored = corpus
      .select(col("doc_id"), col("text"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val winA = scored.filter(_._1 % 3 == 0).map(t => (t._2, t._3))
    val winB = scored.sortBy(_._3).take(25).map(t => (t._2, t._3))

    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    def at(base: String, s: (String, Double)) =
      (Timestamp.valueOf(base), s._1)
    val rowsA = winA.map(at("2026-01-01 10:00:00", _))
    val rowsB = winB.map(at("2026-01-01 10:10:00", _))
    // sentinel far past both windows: advances the watermark so both emit
    val tail = Seq((Timestamp.valueOf("2026-01-01 11:00:00"), "watermark advancer"))

    val in = Files.createTempDirectory("sdrift")
    val raw = spark.readStream.schema("ts TIMESTAMP, text STRING")
      .parquet(in.toString)
    val q = StreamingDriftMonitor.psi(raw, baseline,
        windowLen = "10 minutes", watermark = "1 second")
      .writeStream.format("memory").queryName("sdrift_psi")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sdriftck").toString)
      .start()
    try {
      for (chunk <- Seq(rowsA.toSeq, rowsB.take(12).toSeq, rowsB.drop(12).toSeq, tail)) {
        chunk.toDF("ts", "text")
          .coalesce(1).write.mode("append").parquet(in.toString)
        q.processAllAvailable()
      }
    } finally q.stop()

    val byWin = spark.table("sdrift_psi")
      .select(col("window_start").cast("string"), col("n_docs"), col("psi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // independent recompute: plain Scala histogram + PSI
    def expectedPsi(qs: Seq[Double]): Double = {
      val counts = Array.fill(StreamingDriftMonitor.Bins)(0L)
      qs.foreach { v =>
        val b = math.min((v * StreamingDriftMonitor.Bins).toInt,
          StreamingDriftMonitor.Bins - 1)
        counts(b) += 1
      }
      val n = qs.length.toDouble
      val psi = (0 until StreamingDriftMonitor.Bins).map { b =>
        val p = (counts(b) + 1.0) / (n + StreamingDriftMonitor.Bins)
        val qq = baseline(b)
        (p - qq) * math.log(p / qq)
      }.sum
      // Spark round() is HALF_UP BigDecimal rounding — mirror it exactly
      BigDecimal(psi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val (na, psiA) = byWin("2026-01-01 10:00:00")
    val (nb, psiB) = byWin("2026-01-01 10:10:00")
    assert(na == winA.length && nb == winB.length)
    assert(psiA == expectedPsi(winA.map(_._2).toSeq), s"$psiA")
    assert(psiB == expectedPsi(winB.map(_._2).toSeq), s"$psiB")
    // the planted low-quality window alerts; the representative one is quiet
    assert(psiB > psiA + 0.5, s"psiB=$psiB psiA=$psiA")
  }
}
