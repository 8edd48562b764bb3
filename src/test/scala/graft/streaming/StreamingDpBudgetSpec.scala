package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** transformWithState semantics of the DP budget accountant: spend
  * accumulates across micro-batches and restarts cannot forget it,
  * the release crossing the cap is REFUSED (visibly — refusals are
  * emitted, never dropped), refused releases spend nothing, consumers
  * are independent ledgers, a redelivered release_id is answered as a
  * spend-free duplicate, and an overflowing eps_micro cannot bypass
  * the cap.
  */
class StreamingDpBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cap enforced across batches; refusals visible and spend-free") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = Files.createTempDirectory("dpb")
    val raw = spark.readStream
      .schema("consumer STRING, release_id LONG, mechanism STRING, eps_micro LONG")
      .option("header", "true").csv(dir.toString)
    // cap = 4.0 eps (the registered surface's sequential total)
    val out = StreamingDpBudget(raw.as[DpReq], capMicro = 4000000L)
    val query = out.writeStream.format("memory").queryName("dpb")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("dpbck").toString)
      .start()
    try {
      // batch 1: team-a runs three 1.0-eps releases; team-b one 3.5
      Files.writeString(dir.resolve("b1.csv"),
        "consumer,release_id,mechanism,eps_micro\n" +
          "a,1,dp_release,1000000\na,2,dp_mean_release,1000000\n" +
          "a,3,dp_topk,1000000\nb,1,dp_quantile,3500000\n")
      query.processAllAvailable()
      val t1 = spark.table("dpb").as[DpVerdict].collect().toSet
      assert(t1 == Set(
        DpVerdict("a", 1, "dp_release", 1000000L, 1000000L, true, false),
        DpVerdict("a", 2, "dp_mean_release", 1000000L, 2000000L, true, false),
        DpVerdict("a", 3, "dp_topk", 1000000L, 3000000L, true, false),
        DpVerdict("b", 1, "dp_quantile", 3500000L, 3500000L, true, false)))

      // batch 2: a's 1.5 would cross (3.0+1.5 > 4.0) -> REFUSED and
      // spends nothing, so the later (by release_id) exact-fit 1.0
      // IS admitted; b's 0.5 fits exactly at the cap. a,2 is an
      // at-least-once REDELIVERY from batch 1: answered as a
      // spend-free duplicate (the original admit stands; a second
      // spend here is exactly the double-spend the ledger exists to
      // prevent).
      Files.writeString(dir.resolve("b2.csv"),
        "consumer,release_id,mechanism,eps_micro\n" +
          "a,2,dp_mean_release,1000000\n" +
          "a,4,dp_release,1500000\na,5,dp_release,1000000\n" +
          "b,2,dp_release,500000\n")
      query.processAllAvailable()
      val t2 = spark.table("dpb").as[DpVerdict].collect().toSet
      assert(t2 == t1 ++ Set(
        DpVerdict("a", 2, "dp_mean_release", 1000000L, 3000000L, false, true),
        DpVerdict("a", 4, "dp_release", 1500000L, 3000000L, false, false),
        DpVerdict("a", 5, "dp_release", 1000000L, 4000000L, true, false),
        DpVerdict("b", 2, "dp_release", 500000L, 4000000L, true, false)))

      // batch 3: both at the cap -> every further request refused,
      // every refusal answered. b,4 asks for Long.MaxValue micro-eps:
      // the naive `spent + eps <= cap` sum wraps negative and ADMITS
      // it — the overflow-safe form must refuse.
      Files.writeString(dir.resolve("b3.csv"),
        "consumer,release_id,mechanism,eps_micro\n" +
          "a,6,dp_topk,1\nb,3,dp_topk,1\n" +
          s"b,4,dp_release,${Long.MaxValue}\n")
      query.processAllAvailable()
      val t3 = spark.table("dpb").as[DpVerdict].collect().toSet
      assert(t3 == t2 ++ Set(
        DpVerdict("a", 6, "dp_topk", 1L, 4000000L, false, false),
        DpVerdict("b", 3, "dp_topk", 1L, 4000000L, false, false),
        DpVerdict("b", 4, "dp_release", Long.MaxValue, 4000000L, false, false)))
    } finally {
      query.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("overflow request against a fresh ledger is refused, not wrapped in") {
    import spark.implicits._
    // Batch parity path: a consumer with zero spend asks for
    // Long.MaxValue. s + eps wraps to a negative Long <= cap, so the
    // unguarded check admits it AND records a negative spend —
    // unbounded further budget. The guard must refuse with spend 0.
    val out = StreamingDpBudget(
      Seq(DpReq("fresh", 1L, "dp_release", Long.MaxValue)).toDS(),
      capMicro = 4000000L).collect().toSeq
    assert(out == Seq(
      DpVerdict("fresh", 1L, "dp_release", Long.MaxValue, 0L, false, false)))
  }
}
