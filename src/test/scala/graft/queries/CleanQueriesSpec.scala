package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the Gopher quality suite and the C4 cleaning
  * pipeline: planted corpora with hand-computed signal values, one
  * discriminating document per rule, verdict ordering, and the cleaned-
  * text md5 witness.
  */
class CleanQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plantedDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-clean").toString
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

  // -------------------------------------------------------- gq_signals

  test("gq_signals: hand-computed values on tiny planted docs") {
    val dir = plantedDir(Seq(
      (1L, "aa bb cc"),                     // 3 short words, no stopwords
      (2L, "## aa #"),                      // hash symbols
      (3L, "wait... more…\nok..."),         // ellipses, 2 lines
      (4L, "- aa bb\n* cc dd\nplain line")))// 2 of 3 bullet lines
    val sig = CleanQueries.gqSignals(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = sig(1L)
    assert(d1.getAs[Long]("n_words") == 3L)
    assert(d1.getAs[Double]("mean_word_len") == 2.0)
    assert(d1.getAs[Double]("alpha_word_frac") == 1.0)
    assert(d1.getAs[Long]("req_stop_hits") == 0L)
    val d2 = sig(2L)
    assert(d2.getAs[Double]("hash_ratio") == 1.0)       // 3 '#' / 3 words
    assert(d2.getAs[Double]("alpha_word_frac") == r6(1.0 / 3))
    val d3 = sig(3L)
    assert(d3.getAs[Double]("ellipsis_ratio") == 1.0)   // 2×'...' + 1×'…' / 3
    assert(d3.getAs[Double]("ellipsis_line_frac") == 1.0) // both lines end so
    val d4 = sig(4L)
    assert(d4.getAs[Double]("bullet_line_frac") == r6(2.0 / 3))
  }

  test("gq_filter: one discriminating doc per rule, verdict order holds") {
    // each doc satisfies every rule EXCEPT the one it plants
    val keeper = ((1 to 48).map(i => s"word$i") ++
      Seq("the", "with", "and", "that")).mkString(" ")
    val shortDoc = "the and small doc."                 // word_count only
    val tinyWords = ((1 to 60).map(_ => "ab") ++
      Seq("the", "to")).mkString(" ")                   // mean_word_len only
    val noStops = (1 to 52).map(i => s"word$i").mkString(" ") // stop_words
    val dir = plantedDir(Seq(
      (1L, keeper), (2L, shortDoc), (3L, tinyWords), (4L, noStops)))
    val out = CleanQueries.gqFilter(spark, dir)
      .as[(Long, Boolean, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((true, 0L, "")))
    assert(out(2L) == ((false, 1L, "word_count")))
    assert(out(3L) == ((false, 1L, "mean_word_len")))
    assert(out(4L) == ((false, 1L, "stop_words")))
  }

  test("gq_filter verdicts agree with gq_signals rules on real data") {
    val dir = "/root/testdata/sf0.001"
    val sig = CleanQueries.gqSignals(spark, dir).collect()
    val ver = CleanQueries.gqFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    sig.foreach { r =>
      val expected =
        !(r.getAs[Long]("n_words") < 50 || r.getAs[Long]("n_words") > 100000) &&
        !(r.getAs[Double]("mean_word_len") < 3.0 || r.getAs[Double]("mean_word_len") > 10.0) &&
        r.getAs[Double]("hash_ratio") <= 0.1 &&
        r.getAs[Double]("ellipsis_ratio") <= 0.1 &&
        r.getAs[Double]("bullet_line_frac") <= 0.90 &&
        r.getAs[Double]("ellipsis_line_frac") <= 0.30 &&
        r.getAs[Double]("alpha_word_frac") >= 0.80 &&
        r.getAs[Long]("req_stop_hits") >= 2
      assert(ver(r.getLong(0)) == expected, s"doc ${r.getLong(0)}")
    }
  }

  // ------------------------------------------------------ gopher_filter

  test("gopher_filter = gq_filter AND rep_filter; quality reasons win") {
    val dir = "/root/testdata/sf0.001"
    val gq = CleanQueries.gqFilter(spark, dir)
      .as[(Long, Boolean, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val rep = QualityQueries.repFilter(spark, dir)
      .as[(Long, Boolean, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val all = CleanQueries.gopherFilter(spark, dir)
      .as[(Long, Boolean, Long, String)].collect()
    assert(all.nonEmpty)
    all.foreach { case (id, keep, nv, first) =>
      val (gk, gn, gf) = gq(id)
      val (rk, rn, rf) = rep(id)
      assert(keep == (gk && rk), s"doc $id keep")
      assert(nv == gn + rn, s"doc $id count")
      assert(first == (if (!gk) gf else rf), s"doc $id first reason")
    }
  }

  // ---------------------------------------------------------- c4_clean

  /** 24 tokens → 4 planted 6-token base lines; line j loses its '.' when
    * (doc_id + j) % 4 == 0.
    */
  private def tok24(p: String): String =
    (1 to 24).map(i => s"$p$i").mkString(" ")

  private def c4Rows(dir: String): Map[Long, (Long, Long, Long, Boolean, String, String)] =
    CleanQueries.c4Clean(spark, dir)
      .as[(Long, Long, Long, Long, Boolean, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("c4_clean: line rules drop unpunctuated and short lines; md5 witness") {
    val dir = plantedDir(Seq((1L, tok24("t")), (5L, (1 to 12).map(i => s"s$i").mkString(" "))))
    val out = c4Rows(dir)
    // doc 1: line j=3 loses '.' ((1+3)%4==0) → 3 of 4 lines kept
    val cleanDoc1 = Seq(
      (1 to 6).map(i => s"t$i").mkString(" ") + ".",
      (7 to 12).map(i => s"t$i").mkString(" ") + ".",
      (13 to 18).map(i => s"t$i").mkString(" ") + ".").mkString("\n")
    assert(out(1L) == ((4L, 3L, 3L, true, "", md5hex(cleanDoc1))))
    // doc 5: 12 tokens → 2 lines, both keep '.' → only 2 sentences
    assert(out(5L) == ((2L, 2L, 2L, false, "too_few_sentences",
      md5hex(Seq(
        (1 to 6).map(i => s"s$i").mkString(" ") + ".",
        (7 to 12).map(i => s"s$i").mkString(" ") + ".").mkString("\n")))))
  }

  test("c4_clean: planted page rules fire with the right first reason") {
    val dir = plantedDir(Seq(
      (22L, tok24("a")),    // %11: javascript line — dropped, page SURVIVES
      (26L, tok24("b")),    // %13: curly brace — page dies
      (34L, tok24("c")),    // %17: lorem ipsum — page dies
      (38L, tok24("d")),    // %19: blocklist word — page dies
      (221L, tok24("e")))) // %13 AND %17: lorem_ipsum wins the reason order
    val out = c4Rows(dir)
    // javascript line raises n_lines but not kept_lines; page keeps
    assert(out(22L)._1 == 5L && out(22L)._2 == 3L && out(22L)._4)
    assert(out(26L)._4 == false && out(26L)._5 == "curly_brace")
    assert(out(34L)._4 == false && out(34L)._5 == "lorem_ipsum")
    assert(out(38L)._4 == false && out(38L)._5 == "bad_words")
    assert(out(221L)._5 == "lorem_ipsum") // order: bad, lorem, brace, few
  }

  test("gq_signals: CRLF lines and vertical-tab indents match RE2 semantics") {
    // \r\n separators: the \r?\n split hands the end-anchored rules
    // \r-free lines (Java '$'/'\z' and RE2 '$' then agree); a \x0B
    // (vertical tab) indent is NOT bullet whitespace in either engine —
    // Java \s includes \x0B but RE2 \s doesn't, so the rule uses [ \t]
    val dir = plantedDir(Seq(
      (7L, "wait...\r\n- aa bb\r\n\u000B- vt bullet\r\nplain")))
    val sig = CleanQueries.gqSignals(spark, dir).collect().head
    assert(sig.getAs[Double]("ellipsis_line_frac") == 0.25) // wait... only
    assert(sig.getAs[Double]("bullet_line_frac") == 0.25)   // "- aa bb" only
  }

  test("c4 core: CRLF text keeps punctuated lines; page kills are case-insensitive") {
    val mk = (id: Long, text: String) =>
      (id, text)
    val rows = Seq(
      mk(1L, Seq( // CRLF doc: every line terminal-punctuated once \r is gone
        "one two three four five.",
        "Lorem Ipsum word one two three.", // uppercase must still kill
        "six seven eight nine ten.").mkString("\r\n")),
      mk(2L, Seq(
        "one two three four five.",
        "a Badword word one two three.",   // uppercase blocklist hit
        "six seven eight nine ten.").mkString("\r\n")),
      mk(3L, Seq(
        "one two three four five.",
        "clean middle line stays here.",
        "six seven eight nine ten.").mkString("\r\n")))
    val out = graft.streaming.StreamingC4Gate
      .gate(rows.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Boolean, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // all 3 CRLF lines survive the line filter in every doc — under the
    // old bare-\n split each kept a trailing \r and Java-vs-RE2 diverged
    assert(out.values.forall(r => r._2 == 3L && r._3 == 3L && r._4 == 3L))
    assert(!out(1L)._5 && out(1L)._6 == "lorem_ipsum")
    assert(!out(2L)._5 && out(2L)._6 == "bad_words")
    assert(out(3L)._5 && out(3L)._6 == "")
  }
}
