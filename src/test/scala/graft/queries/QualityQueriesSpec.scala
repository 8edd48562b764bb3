package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the repetition-quality signals (Gopher §A1.1 rules)
  * and the exact-substring dedup rewrite: planted corpora with hand- or
  * locally-computed expectations, including the keeper rule, interval
  * merging, intra-document repeats, and the short-doc clamped window.
  */
class QualityQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plantedDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-quality").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r6(x: Double): Double = math.round(x * 1e6) / 1e6

  // ------------------------------------------------------- rep_signals

  test("rep_signals: duplicate-line fraction and char mass on a multi-line doc") {
    val dir = plantedDir(Seq(
      (1L, "a b\nc d\na b\na b"), // 4 lines, 2 distinct
      (2L, "single line only")))
    val out = repRow(dir, 1L)
    assert(out("dup_line_frac") == 0.5)          // (4-2)/4
    assert(out("dup_line_char_frac") == 0.5)     // (3-1)*3 / (3*3+3)
    val clean = repRow(dir, 2L)
    assert(clean("dup_line_frac") == 0.0)
    assert(clean("dup_line_char_frac") == 0.0)
  }

  test("rep_signals: top-2-gram char mass with the max-count winner") {
    // 2-grams of [x y x y x y]: "x y"x3, "y x"x2 → winner mass 3*3 over 11
    val dir = plantedDir(Seq((1L, "x y x y x y")))
    val out = repRow(dir, 1L)
    assert(out("top2_frac") == r6(9.0 / 11))
    // 3-grams tie at count 2 and equal length → lexicographically
    // smallest ("x y x") wins; same mass either way here: 2*5/11
    assert(out("top3_frac") == r6(10.0 / 11))
    // both 5-grams occur once → no duplicated-5-gram mass
    assert(out("dup5_frac") == 0.0)
  }

  test("rep_signals: duplicated-5-gram mass counts every occurrence") {
    // "c1..c5" at positions 3 and 11; every other 5-gram unique
    val dir = plantedDir(Seq(
      (1L, "u1 u2 u3 c1 c2 c3 c4 c5 u4 u5 u6 c1 c2 c3 c4 c5")))
    val out = repRow(dir, 1L)
    assert(out("dup5_frac") == r6(2.0 * 14 / 47))
  }

  test("rep_signals: doc shorter than n yields zero for that signal") {
    val dir = plantedDir(Seq((1L, "a b c")))
    val out = repRow(dir, 1L)
    assert(out("dup5_frac") == 0.0 && out("top4_frac") == 0.0)
    assert(out("top2_frac") > 0.0) // 2-grams exist
  }

  // -------------------------------------------------------- rep_filter

  test("rep_filter: clean doc keeps; heavy repetition violates every rule, " +
    "first violation follows threshold-table order") {
    // the clean doc must be LONG: on a short one a single occurrence of
    // the longest n-gram already exceeds the top-n char-mass thresholds.
    // doc 2 repeats one PARAGRAPH four times so the paragraph rules fire
    // too (its \n\n separators also plant duplicate empty lines).
    val dir = plantedDir(Seq(
      (1L, (1 to 60).map(i => s"w$i").mkString(" ")),
      (2L, "a b c d e\n\na b c d e\n\na b c d e\n\na b c d e")))
    val rows = QualityQueries.repFilter(spark, dir)
      .as[(Long, Boolean, Long, String)].collect().toMap2
    assert(rows(1L) == ((true, 0L, "")))
    val (keep, nv, first) = rows(2L)
    assert(!keep && first == "dup_line_frac")
    assert(nv == QualityQueries.RepThresholds.size) // all 13 rules fire
  }

  // ---------------------------------------------------- paragraph rules

  test("rep_signals: paragraph duplicate fraction and char mass; " +
    "single-paragraph text scores 0 on both") {
    val dir = plantedDir(Seq(
      (1L, "p one here\n\nq two there\n\np one here"), // 3 paras, 2 distinct
      (2L, "no paragraph breaks at all")))
    val out = repRow(dir, 1L)
    assert(out("dup_para_frac") == r6(1.0 / 3))
    // dup_extra = (2-1)*10; Σ para chars = 10+11+10
    assert(out("dup_para_char_frac") == r6(10.0 / 31))
    // \n\n also plants two empty LINES → the line metrics see them:
    // 5 lines, 3 distinct ("p one here"×2, ""×2, "q two there")
    assert(out("dup_line_frac") == r6(2.0 / 5))
    val flat = repRow(dir, 2L)
    assert(flat("dup_para_frac") == 0.0 && flat("dup_para_char_frac") == 0.0)
  }

  test("rep_para: planted third-paragraph duplicate culls, clean docs keep") {
    val dir = plantedDir(Seq(
      (3L, (1 to 12).map(i => s"a$i").mkString(" ")), // %3==0 → planted dup
      (4L, (1 to 12).map(i => s"b$i").mkString(" "))))
    val out = QualityQueries.repPara(spark, dir)
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    assert(out(3L) == ((3L, r6(1.0 / 3), false))) // 3 paras, first repeated
    assert(out(4L) == ((2L, 0.0, true)))
  }

  test("rep_filter verdicts agree with rep_signals thresholds on real data") {
    val dir = "/root/testdata/sf0.001"
    val sig = QualityQueries.repSignals(spark, dir).collect()
    val ver = QualityQueries.repFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val names = QualityQueries.RepThresholds
    sig.foreach { r =>
      val expected = names.forall { case (n, t) =>
        r.getAs[Double](n) <= t
      }
      assert(ver(r.getLong(0)) == expected, s"doc ${r.getLong(0)}")
    }
  }

  // --------------------------------------------------- span_dedup_text

  test("span_dedup_text: keeper doc unchanged, exact duplicate empties") {
    val t = "w1 w2 w3 w4 w5 w6 w7 w8"
    val dir = plantedDir(Seq((1L, t), (2L, t)))
    val out = dedupRows(dir)
    assert(out(1L) == ((8L, 0L, md5hex(t))))
    assert(out(2L) == ((8L, 8L, md5hex(""))))
  }

  test("span_dedup_text: later cross-doc span strips and islands merge") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val doc1 = shared                                          // keeper
    val doc2 = s"y1 y2 y3 $shared y4 y5"                       // span at 3..12
    val dir = plantedDir(Seq((1L, doc1), (2L, doc2)))
    val out = dedupRows(dir)
    assert(out(1L) == ((10L, 0L, md5hex(doc1))))
    assert(out(2L) == ((15L, 10L, md5hex("y1 y2 y3 y4 y5"))))
  }

  test("span_dedup_text: intra-document repeat keeps the first occurrence") {
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val dir = plantedDir(Seq((1L, s"$run $run"), (2L, "other words entirely")))
    val out = dedupRows(dir)
    assert(out(1L) == ((16L, 8L, md5hex(run))))
    assert(out(2L)._2 == 0L)
  }

  test("span_dedup_text: short docs dedup through the clamped window") {
    val dir = plantedDir(Seq((1L, "a b c d e"), (2L, "a b c d e")))
    val out = dedupRows(dir)
    assert(out(1L) == ((5L, 0L, md5hex("a b c d e"))))
    assert(out(2L) == ((5L, 5L, md5hex(""))))
  }

  // ------------------------------------------------------- hygiene_funnel

  test("hygiene_funnel: every stage attrits the planted corpus as designed") {
    val m = (1 to 40).map(i => s"m$i").mkString(" ") // 40-token clean run
    val n = (1 to 40).map(i => s"n$i").mkString(" ")
    val z = (1 to 5).map(i => s"z$i").mkString(" ")  // 5-token shared tail
    val dir = plantedDir(Seq(
      (1L, m),                                        // keeper
      (2L, "a b c d e\na b c d e\na b c d e\na b c d e"), // rep-filtered
      (3L, s"$m $z"),                                 // strips to the tail
      (4L, m),                                        // rewrites to empty
      (5L, n),                                        // keeper
      (6L, s"$n $z")))                                // tail dups doc 3's
    val out = QualityQueries.hygieneFunnel(spark, dir)
      .as[(Long, String, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      (1L, "rep_filter", 6L, 5L, 230L, 210L),  // doc 2 (20 tokens) removed
      (2L, "span_dedup", 5L, 4L, 210L, 90L),   // doc 4 empties; 3/6 → tails
      (3L, "exact_dedup", 4L, 3L, 90L, 85L)))  // doc 6's tail dups doc 3's
    // the cluster-scale stage-persistence strategy yields the same funnel
    spark.conf.set(graft.operators.Materialize.Key, "parquet")
    try assert(QualityQueries.hygieneFunnel(spark, dir)
      .as[(Long, String, Long, Long, Long, Long)].collect().toList == out)
    finally spark.conf.unset(graft.operators.Materialize.Key)
  }

  // ------------------------------------------------------------ helpers

  private def repRow(dir: String, id: Long): Map[String, Double] = {
    val df = QualityQueries.repSignals(spark, dir)
    val cols = df.columns.filter(_ != "doc_id")
    val row = df.where(col("doc_id") === id).head()
    cols.map(c => c -> row.getAs[Double](c)).toMap
  }

  private def dedupRows(dir: String): Map[Long, (Long, Long, String)] =
    QualityQueries.spanDedupText(spark, dir)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  private implicit class Tup4Map(
      rows: Array[(Long, Boolean, Long, String)]) {
    def toMap2: Map[Long, (Boolean, Long, String)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
