package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The streaming DP release must (1) emit window × group rows through
  * the append-mode watermark contract, (2) equal the SAME function run
  * over the batch frame (stream/batch parity — the restart-replay
  * determinism the budget accounting depends on), and (3) carry noise
  * matching an independent driver-side inverse-CDF recompute per cell.
  */
class StreamingDpReleaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed release equals batch replay and independent noise recompute") {
    import spark.implicits._
    // planted arrivals: two 10-minute windows, two groups, known counts
    def rows(base: String, group: String, k: Int) =
      (1 to k).map(i => (Timestamp.valueOf(base), group))
    val all = rows("2026-01-01 10:00:00", "src1", 7) ++
      rows("2026-01-01 10:01:00", "src2", 3) ++
      rows("2026-01-01 10:10:00", "src1", 5) ++
      rows("2026-01-01 10:11:00", "src2", 11)
    val tail = Seq((Timestamp.valueOf("2026-01-01 11:00:00"), "advancer"))

    val in = Files.createTempDirectory("sdp")
    val raw = spark.readStream.schema("ts TIMESTAMP, source STRING")
      .parquet(in.toString)
    val q = StreamingDpRelease.release(raw, "source",
        windowLen = "10 minutes", watermark = "1 second")
      .writeStream.format("memory").queryName("sdp_rel")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sdpck").toString)
      .start()
    try {
      for (chunk <- Seq(all.take(10), all.drop(10), tail)) {
        chunk.toDF("ts", "source")
          .coalesce(1).write.mode("append").parquet(in.toString)
        q.processAllAvailable()
      }
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("source"))
    val streamed = spark.table("sdp_rel").collect()
      .map(r => key(r) -> (r.getAs[Double]("noisy_count"), r.getAs[Long]("released")))
      .toMap

    // batch parity: the same function over the same arrivals as a frame
    val batch = StreamingDpRelease.release(
        all.toDF("ts", "source"), "source", "10 minutes", "1 second")
      .collect().map(r => key(r) -> (r.getAs[Double]("noisy_count"), r.getAs[Long]("released")))
      .toMap
    assert(streamed.keySet == batch.keySet && streamed.keySet.size == 4)
    assert(streamed == batch, "stream and batch replay must release identically")

    // independent noise recompute for each cell
    val truth = Map(
      ("2026-01-01 10:00:00.0", "src1") -> 7L, ("2026-01-01 10:00:00.0", "src2") -> 3L,
      ("2026-01-01 10:10:00.0", "src1") -> 5L, ("2026-01-01 10:10:00.0", "src2") -> 11L)
    val md = java.security.MessageDigest.getInstance("MD5")
    truth.foreach { case ((ws, g), n) =>
      val epoch = Timestamp.valueOf(ws).getTime / 1000
      val hex = md.digest(s"dpw_${g}_$epoch".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.take(8), 16).toDouble + 0.5) / 4294967296.0
      val noise = -math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val got = streamed((ws, g))
      assert(math.abs(got._1 - (n + noise)) < 1e-4,
        s"cell ($ws,$g): ${got._1} vs ${n + noise}")
      assert(got._2 == math.max(0L, math.rint(n + noise).toLong))
    }
  }
}
