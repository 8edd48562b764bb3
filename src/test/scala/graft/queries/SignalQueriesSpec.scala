package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the behavioral-signal operators: planted event
  * timelines for the Markov/interarrival queries, the independence and
  * perfect-correlation laws for mutual information, and the
  * one-split-per-cluster law for the leakage-safe split.
  */
class SignalQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Planted events table: (event_id, ts_ns, user_id, event_type). */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-signal").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ts_forecast: seasonal-naive MAE over days with a prior week; " +
       "gap days and the first week contribute nothing") {
    val day = 86400L * 1000000000L // ns
    // type 'a': day 1 → 2 events, day 8 → 5 events (|5-2|=3),
    //           day 15 → 5 (|5-5|=0) → n_days=2, sum=3, mae=1.5
    // type 'b': only day 3 — no prior week, absent from the report
    def burst(t: String, d: Long, n: Int, idBase: Long) =
      (0 until n).map(i => (idBase + i, d * day + i, 1L, t))
    val dir = eventsDir(
      burst("a", 1, 2, 100) ++ burst("a", 8, 5, 200) ++
        burst("a", 15, 5, 300) ++ burst("b", 3, 4, 400))
    val out = SignalQueries.tsForecast(spark, dir)
      .select("event_type", "n_days", "sum_abs_err", "mae")
      .as[(String, Long, Long, Double)].collect().toList
    assert(out == List(("a", 2L, 3L, 1.5)))
  }

  test("markov_transitions counts each user's consecutive steps and " +
       "P(to|from) sums to 1 per from-state") {
    val us = 1000L // 1 µs in ns
    // user 1: a -> b -> a -> b ; user 2: a -> b  => a->b: 3, b->a: 1
    val dir = eventsDir(Seq(
      (1L, 1 * us, 1L, "a"), (2L, 2 * us, 1L, "b"),
      (3L, 3 * us, 1L, "a"), (4L, 4 * us, 1L, "b"),
      (5L, 1 * us, 2L, "a"), (6L, 2 * us, 2L, "b")))
    val out = SignalQueries.markovTransitions(spark, dir)
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(("a", "b", 3L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("interarrival_stats returns the exact ⌈q·m⌉ order statistics of " +
       "per-user gaps") {
    val us = 1000L
    // user 1 type x at 0,10,30,70 µs -> gaps 10,20,40; user 2 gap 30
    val dir = eventsDir(Seq(
      (1L, 0 * us, 1L, "x"), (2L, 10 * us, 1L, "x"),
      (3L, 30 * us, 1L, "x"), (4L, 70 * us, 1L, "x"),
      (5L, 0 * us, 2L, "x"), (6L, 30 * us, 2L, "x")))
    val out = SignalQueries.interarrivalStats(spark, dir)
      .select("event_type", "n_gaps", "p50_us", "p90_us", "max_us")
      .as[(String, Long, Long, Long, Long)].collect().toList
    // sorted gaps: 10,20,30,40; p50 = rank ceil(2.0)=2 -> 20; p90 = rank 4 -> 40
    assert(out == List(("x", 4L, 20L, 40L, 40L)))
  }

  test("mutual_info: lift is 0 under independence and ln(n_langs) under " +
       "perfect correlation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mi").toString
    // 2 sources × 2 langs, perfectly balanced -> independent
    val indep = for (s <- Seq("s1", "s2"); l <- Seq("en", "fr"); i <- 1 to 5)
      yield (s.hashCode.toLong * 100 + l.hashCode % 100 + i, "t", l, s)
    indep.zipWithIndex.map { case ((_, t, l, s), i) => (i.toLong, t, l, s) }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", lit(1L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val lifts = SignalQueries.mutualInfo(spark, dir)
      .select("lift").as[Double].collect()
    assert(lifts.forall(math.abs(_) < 1e-9))

    val dir2 = java.nio.file.Files.createTempDirectory("graft-mi2").toString
    // source determines lang exactly -> lift = ln(N / c_x) = ln(2)
    (1 to 20).map(i => (i.toLong, "t", if (i <= 10) "en" else "fr",
        if (i <= 10) "s1" else "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", lit(1L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val lifts2 = SignalQueries.mutualInfo(spark, dir2)
      .select("lift").as[Double].collect()
    assert(lifts2.length == 2)
    lifts2.foreach(l => assert(math.abs(l - math.log(2.0)) < 1e-6))
  }

  test("split_leakage_safe: every near-dup cluster lives in exactly one " +
       "split, and all three splits exist") {
    val out = SignalQueries.splitLeakageSafe(spark, "/root/testdata/sf0.001")
      .select("cluster_id", "split").as[(Long, String)].collect()
    out.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).distinct.length == 1, s"cluster ${g.head._1} spans splits")
    }
    assert(out.map(_._2).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }
}
