package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** End-to-end wiring of the DP budget accountant in FRONT of the
  * streaming release's emit path: admitted windows re-emit their cells
  * with accounting attached and match the ungated release exactly; the
  * window that would overshoot the cap emits NOTHING — no group, no
  * noisy count, no released value — only one visible refusal row, and
  * spends nothing; and a restart from checkpoint cannot double-spend:
  * the RocksDB ledger remembers the spend, so post-restart windows are
  * still refused (a forgotten ledger would re-admit them).
  */
class StreamingDpGatedReleaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cap gates the emit path; refusal visible; restart keeps the spend") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = Files.createTempDirectory("sdpg")
    val out = Files.createTempDirectory("sdpgout").toString
    val ck = Files.createTempDirectory("sdpgck").toString

    def arrivals(base: String, group: String, k: Int) =
      (1 to k).map(_ => (Timestamp.valueOf(base), group))
    def start() = {
      val raw = spark.readStream.schema("ts TIMESTAMP, source STRING")
        .parquet(in.toString)
      // cap 2.5 eps, each window costs Eps = 1.0: windows 1-2 admit,
      // window 3+ must be refused (2.0 + 1.0 > 2.5)
      StreamingDpRelease.releaseGated(raw, "source",
          windowLen = "10 minutes", watermark = "1 second",
          consumer = "ops", capMicro = 2500000L)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck).start()
    }
    def feed(q: org.apache.spark.sql.streaming.StreamingQuery,
             rows: Seq[(Timestamp, String)]): Unit = {
      rows.toDF("ts", "source").coalesce(1).write.mode("append").parquet(in.toString)
      q.processAllAvailable()
    }

    val q1 = start()
    try {
      // windows at 10:00 and 10:10 (closed by the 10:30 arrivals),
      // then 10:30 (closed by the 11:00 advancer) overshoots
      feed(q1, arrivals("2026-01-01 10:00:00", "src1", 7) ++
        arrivals("2026-01-01 10:01:00", "src2", 3) ++
        arrivals("2026-01-01 10:10:00", "src1", 5))
      feed(q1, arrivals("2026-01-01 10:30:00", "src1", 4))
      feed(q1, Seq((Timestamp.valueOf("2026-01-01 11:00:00"), "advancer")))

      val rows = spark.read.parquet(out).as[DpGatedCell].collect()
      val admitted = rows.filter(_.admitted)
      // windows 1 (src1+src2) and 2 (src1) admitted: 3 cells
      assert(admitted.map(c => (c.window_start.toString, c.group.get)).toSet ==
        Set(("2026-01-01 10:00:00.0", "src1"), ("2026-01-01 10:00:00.0", "src2"),
          ("2026-01-01 10:10:00.0", "src1")))
      assert(admitted.forall(c => c.noisy_count.isDefined && c.released.isDefined))
      assert(admitted.filter(_.window_start.toString.startsWith("2026-01-01 10:00"))
        .forall(_.spent_after == 1000000L))
      assert(admitted.filter(_.window_start.toString.startsWith("2026-01-01 10:10"))
        .forall(_.spent_after == 2000000L))
      // admitted values equal the ungated release (gating is pass-through)
      val unGated = StreamingDpRelease.release(
          (arrivals("2026-01-01 10:00:00", "src1", 7) ++
            arrivals("2026-01-01 10:01:00", "src2", 3) ++
            arrivals("2026-01-01 10:10:00", "src1", 5)).toDF("ts", "source"),
          "source", "10 minutes", "1 second")
        .collect().map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("source")) -> r.getAs[Double]("noisy_count")).toMap
      admitted.foreach { c =>
        assert(c.noisy_count.get ==
          unGated((c.window_start.toString, c.group.get))) }

      // the 10:30 window: ONE visible refusal, nothing released, no spend
      val refused = rows.filter(r => !r.admitted && !r.duplicate)
      assert(refused.length == 1)
      val r = refused.head
      assert(r.window_start.toString == "2026-01-01 10:30:00.0")
      assert(r.group.isEmpty && r.noisy_count.isEmpty && r.released.isEmpty)
      assert(r.spent_after == 2000000L, "a refused window must spend nothing")
      assert(rows.count(_.window_start.toString == "2026-01-01 10:30:00.0") == 1,
        "the refused window must emit NOTHING besides the refusal row")
    } finally q1.stop()

    // restart from the same checkpoint: the ledger must remember the
    // 2.0 spend, so the next window is refused too (a fresh ledger
    // would admit it at spent_after = 1.0)
    val q2 = start()
    try {
      feed(q2, arrivals("2026-01-01 11:30:00", "src2", 6))
      feed(q2, Seq((Timestamp.valueOf("2026-01-01 12:10:00"), "advancer")))
      val after = spark.read.parquet(out).as[DpGatedCell].collect()
        .filter(_.window_start.toString == "2026-01-01 11:30:00.0")
      assert(after.length == 1 && !after.head.admitted)
      assert(after.head.spent_after == 2000000L,
        "restart must not forget (or double) the spend")
    } finally {
      q2.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
