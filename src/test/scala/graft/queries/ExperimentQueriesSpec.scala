package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the monitoring/experimentation operators: planted
  * distributions with hand-computable drift/Gini/winsorized values and
  * the A/B identity laws.
  */
class ExperimentQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def corrDocsDir(rows: Seq[(Long, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-corr").toString
    rows.toDF("doc_id", "text", "n_chars")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** k distinct single-char-ish tokens. */
  private def toks(k: Int): String = (0 until k).map(i => s"t$i").mkString(" ")

  private def benfordOrdersDir(prices: Seq[Double]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-benford").toString
    prices.zipWithIndex
      .map { case (p, i) => (i.toLong, 1L, "O", p, "2024-01-01") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("benford_audit: digits count by string head, shares sum against " +
       "the fixed expectation table") {
    // 6×1xx, 3×2xx, 1×9xx → observed 0.6 / 0.3 / 0.1
    val dir = benfordOrdersDir(
      Seq.fill(6)(150.0) ++ Seq.fill(3)(250.0) ++ Seq(900.0))
    val got = ExperimentQueries.benfordAudit(spark, dir)
      .select("digit", "n", "observed", "expected", "abs_dev")
      .as[(Long, Long, Double, Double, Double)].collect().toList
    assert(got.map(r => (r._1, r._2, r._3)) ==
      List((1L, 6L, 0.6), (2L, 3L, 0.3), (9L, 1L, 0.1)))
    val d1 = got.head
    assert(d1._4 == 0.301030 && math.abs(d1._5 - 0.29897) < 1e-6)
  }

  test("corr_matrix: affine metrics give r = 1.0 on every pair") {
    // tokens = uniq = k, chars = 3k+7 — all three pairwise r exactly 1
    val dir = corrDocsDir((1 to 5).map(k => (k.toLong, toks(k), 3L * k + 7)))
    val rows = ExperimentQueries.corrMatrix(spark, dir)
      .select("metric_x", "metric_y", "r").as[(String, String, Double)]
      .collect().toList
    assert(rows.map(_._3) == List(1.0, 1.0, 1.0))
    assert(rows.map(t => (t._1, t._2)) == List(
      ("chars", "tokens"), ("chars", "uniq_tokens"), ("tokens", "uniq_tokens")))
  }

  test("corr_matrix: negatively-sloped chars flip sign on chars pairs only") {
    val dir = corrDocsDir((1 to 5).map(k => (k.toLong, toks(k), 1000L - 5 * k)))
    val got = ExperimentQueries.corrMatrix(spark, dir)
      .select("metric_x", "metric_y", "r").as[(String, String, Double)]
      .collect().map { case (mx, my, r) => (mx, my) -> r }.toMap
    assert(got(("chars", "tokens")) == -1.0)
    assert(got(("chars", "uniq_tokens")) == -1.0)
    assert(got(("tokens", "uniq_tokens")) == 1.0)
  }

  test("topic_drift: identical days drift 0; a vanished type contributes " +
       "its full proportion") {
    val day = 86400L * 1000000000L // ns
    // day 1: 2×a 2×b; day 2: 2×a 2×b (same) -> drift 0
    // day 3: 4×a (b vanished) -> |1-0.5| + |0-0.5| = 1.0
    val rows = Seq(
      (1L, 1 * day, 1L, "a"), (2L, 1 * day + 1, 1L, "b"),
      (3L, 1 * day + 2, 2L, "a"), (4L, 1 * day + 3, 2L, "b"),
      (5L, 2 * day, 1L, "a"), (6L, 2 * day + 1, 1L, "b"),
      (7L, 2 * day + 2, 2L, "a"), (8L, 2 * day + 3, 2L, "b"),
      (9L, 3 * day, 1L, "a"), (10L, 3 * day + 1, 1L, "a"),
      (11L, 3 * day + 2, 2L, "a"), (12L, 3 * day + 3, 2L, "a"))
      .map { case (id, ts, u, t) => (id, ts, u, t, 1.0) }
    val out = ExperimentQueries.topicDrift(spark, eventsDir(rows))
      .select("l1_drift").as[Double].collect().toList
    assert(out == List(0.0, 1.0))
  }

  test("psi_drift: identical day distributions give all-zero terms; a " +
       "shifted day yields a positive PSI total") {
    val day = 86400L * 1000000000L
    // days 1,2: values uniform low; day 3: values jump to the top bins
    val rows =
      (0 until 20).map(i => (i.toLong, 1 * day + i, 1L, "e", (i % 5).toDouble)) ++
      (0 until 20).map(i => (100L + i, 2 * day + i, 1L, "e", (i % 5).toDouble)) ++
      (0 until 20).map(i => (200L + i, 3 * day + i, 1L, "e", 95.0 + (i % 5)))
    val out = ExperimentQueries.psiDrift(spark, eventsDir(rows))
      .select("day", "psi_term").as[(java.sql.Date, Double)].collect()
      .groupBy(_._1.toString).map { case (d, g) => d -> g.map(_._2).sum }
    assert(math.abs(out("1970-01-03")) < 1e-9) // identical distribution
    assert(out("1970-01-04") > 1.0)            // wholesale shift
  }

  test("gini_source: equal lengths give 0; extreme concentration approaches " +
       "(n-1)/n") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gini").toString
    val rows =
      (1 to 10).map(i => (i.toLong, "t", "en", "equal", 100L)) ++
      ((1 to 9).map(i => (100L + i, "t", "en", "skewed", 1L)) :+
        (110L, "t", "en", "skewed", 10000L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val g = ExperimentQueries.giniConcentration(spark, dir)
      .select("source", "gini").as[(String, Double)].collect().toMap
    assert(g("equal") == 0.0)
    assert(g("skewed") > 0.85 && g("skewed") < 0.9) // (n-1)/n = 0.9 limit
  }

  test("winsorized_mean clamps to the discrete p10/p90 and ignores an " +
       "outlier a plain mean chases") {
    val dir = java.nio.file.Files.createTempDirectory("graft-win").toString
    // flag X: 1..9 plus one huge outlier 1000; p10 = rank 1 -> 1,
    // p90 = rank 9 -> 9; clamped sum = 45 + 9 = 54 -> wmean 5.4
    ((1 to 9).map(q => ("X", q.toDouble)) :+ ("X", 1000.0))
      .zipWithIndex.map { case ((f, q), i) => (i.toLong, 1L, f, "O", q) }
      .toDF("l_orderkey", "l_partkey", "l_returnflag", "l_linestatus", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ExperimentQueries.winsorizedMean(spark, dir)
      .select("flag", "lo", "hi", "wmean").as[(String, Long, Long, Double)].collect().toList
    assert(out == List(("X", 1L, 9L, 5.4)))
  }

  private def docsDir(rows: Seq[(Long, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    rows.toDF("doc_id", "lang", "source", "n_chars")
      .withColumn("text", lit("t"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("auc_score: perfect separation gives 1, identical distributions 0.5, " +
       "all-ties 0.5") {
    val perfect = (1 to 10).map(i => (i.toLong, "en", "s", 100L + i)) ++
      (11 to 20).map(i => (i.toLong, "fr", "s", i.toLong))
    val p = ExperimentQueries.aucScore(spark, docsDir(perfect))
      .select("auc").as[Double].head()
    assert(p == 1.0)

    val same = (1 to 10).map(i => (i.toLong, "en", "s", (i % 5).toLong)) ++
      (11 to 20).map(i => (i.toLong, "fr", "s", (i % 5).toLong))
    val s = ExperimentQueries.aucScore(spark, docsDir(same))
      .select("auc").as[Double].head()
    assert(s == 0.5)
  }

  test("ks_by_source: identical-to-rest gives 0; disjoint support gives 1") {
    // s1 and s2 identical; s3 disjoint above both
    val rows = (1 to 10).map(i => (i.toLong, "en", "s1", (i % 5).toLong)) ++
      (11 to 20).map(i => (i.toLong, "en", "s2", (i % 5).toLong)) ++
      (21 to 30).map(i => (i.toLong, "en", "s3", 1000L + i))
    val out = ExperimentQueries.ksBySource(spark, docsDir(rows))
      .select("source", "ks_d").as[(String, Double)].collect().toMap
    assert(out("s3") == 1.0)
    // s1 vs (s2 ∪ s3): at the top of s1's support F_s1 = 1 while the rest
    // (half its mass parked in s3's far tail) sits at 1/2 — D = 1/2
    assert(out("s1") == 0.5)
    assert(out("s1") == out("s2"))
  }

  test("bootstrap_ci: a constant source collapses to a zero-width band at " +
       "the value; a mixed source brackets plausibly and deterministically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-boot").toString
    val rows = (1 to 30).map(i => (i.toLong, "t", "en", "const", 100L)) ++
      (31 to 90).map(i => (i.toLong, "t", "en", "mixed", (i % 10 + 1) * 50L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExperimentQueries.bootstrapCi(spark, dir)
      .select("source", "mean_chars", "ci_lo", "ci_hi")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, cm, clo, chi) = out("const")
    assert(cm == 100.0 && clo == 100.0 && chi == 100.0)
    val (_, mm, mlo, mhi) = out("mixed")
    assert(mlo <= mhi && mlo >= 50.0 && mhi <= 550.0)
    assert(mlo < mm + 50 && mhi > mm - 50) // band sits around the mean
    val again = ExperimentQueries.bootstrapCi(spark, dir)
      .select("ci_lo", "ci_hi").as[(Double, Double)].collect().toSet
    assert(again == out.values.map(r => (r._3, r._4)).toSet)
  }

  test("ab_lift: identical arms yield lift 0 / z 0, and a planted shift is " +
       "detected with positive z") {
    // find user ids hashing to each arm, then give both arms identical values
    val md = java.security.MessageDigest.getInstance("MD5")
    def armOf(u: Long): String = {
      val hex = md.digest(u.toString.getBytes).map("%02x".format(_)).mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
    }
    val as = (1L to 200L).filter(armOf(_) == "A").take(50)
    val bs = (1L to 200L).filter(armOf(_) == "B").take(50)
    val vals = (1 to 50).map(_.toDouble)
    val same = (as.zip(vals) ++ bs.zip(vals)).zipWithIndex.map {
      case ((u, v), i) => (i.toLong, 1000000L + i, u, "e", v) }
    val out = ExperimentQueries.abLift(spark, eventsDir(same))
      .select("rel_lift", "z").as[(Double, Double)].head()
    assert(out == ((0.0, 0.0)))

    val shifted = (as.zip(vals) ++ bs.zip(vals.map(_ + 10.0))).zipWithIndex.map {
      case ((u, v), i) => (i.toLong, 1000000L + i, u, "e", v) }
    val out2 = ExperimentQueries.abLift(spark, eventsDir(shifted))
      .select("rel_lift", "z").as[(Double, Double)].head()
    assert(out2._1 > 0.3 && out2._2 > 1.96)
  }

  test("ab_lift degenerate: a single-event arm yields defined means and a " +
       "NULL z, never NaN/Inf from the n-1 division") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def armOf(u: Long): String = {
      val hex = md.digest(u.toString.getBytes).map("%02x".format(_)).mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
    }
    val aOne = (1L to 200L).filter(armOf(_) == "A").take(1)
    val bs = (1L to 200L).filter(armOf(_) == "B").take(5)
    val rows = (aOne.map((_, 3.0)) ++ bs.zipWithIndex.map { case (u, i) =>
      (u, 1.0 + i) }).zipWithIndex.map {
      case ((u, v), i) => (i.toLong, 1000000L + i, u, "e", v) }
    val row = ExperimentQueries.abLift(spark, eventsDir(rows))
      .select("na", "mean_a", "mean_b", "z").head()
    assert(row.getLong(0) == 1L)
    assert(!row.isNullAt(1) && !row.isNullAt(2)) // means stay defined
    assert(row.isNullAt(3), "z must be NULL, not NaN/Inf")
  }

  test("psi_drift degenerate: all-equal values produce defined zero terms " +
       "instead of a zero-width-bin division") {
    val day = 86400L * 1000000000L
    val rows =
      (0 until 10).map(i => (i.toLong, 1 * day + i, 1L, "e", 7.0)) ++
      (0 until 10).map(i => (100L + i, 2 * day + i, 1L, "e", 7.0))
    val out = ExperimentQueries.psiDrift(spark, eventsDir(rows))
      .select("psi_term").as[Double].collect()
    assert(out.nonEmpty)
    assert(out.forall(v => !v.isNaN && !v.isInfinite && math.abs(v) < 1e-9))
  }
}
