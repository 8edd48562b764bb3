package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the T5 span-corruption prep: an independent Scala
  * re-derivation of the deterministic masking contract (one 3-token
  * span per full 20-token window at an md5-derived offset) must
  * reproduce the engine's input/target fingerprints exactly, and the
  * structural invariants (token accounting, no-mask short docs) must
  * hold.
  */
class SpanCorruptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 20
  private val L = 3

  private def plantedDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-spancorrupt").toString
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

  /** The masking contract, re-derived: span start in window k. */
  private def spanStart(docId: Long, k: Int): Int =
    k * W + (java.lang.Long.parseLong(
      md5hex(s"$docId:$k").substring(0, 8), 16) % (W - L + 1)).toInt

  /** Reference input/target construction over whitespace tokens. */
  private def reference(docId: Long, text: String): (String, String) = {
    val t = text.trim.split("\\s+", -1)
    val nsp = t.length / W
    val starts = (0 until nsp).map(k => spanStart(docId, k))
    val masked = starts.flatMap(s => s until s + L).toSet
    val input = t.indices.flatMap { i =>
      if (starts.contains(i)) Some(s"<extra_id_${i / W}>")
      else if (masked(i)) None
      else Some(t(i))
    }.mkString(" ")
    val target = ((0 until nsp).map(k =>
      s"<extra_id_$k> " + (spanStart(docId, k) until spanStart(docId, k) + L)
        .map(t).mkString(" ")) :+ s"<extra_id_$nsp>").mkString(" ")
    (input, target)
  }

  test("engine fingerprints equal the independent reference construction") {
    val docs = Seq(
      (7L, (1 to 43).map(i => s"w$i").mkString(" ")),  // 2 full windows + tail
      (8L, (1 to 20).map(i => s"x$i").mkString(" ")),  // exactly one window
      (9L, (1 to 19).map(i => s"y$i").mkString(" ")),  // short: no mask
      (10L, (1 to 80).map(i => s"z$i").mkString(" "))) // 4 windows
    val dir = plantedDir(docs)
    val out = TrainQueries.spanCorrupt(spark, dir)
      .as[(Long, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    docs.foreach { case (id, text) =>
      val (refIn, refTgt) = reference(id, text)
      val (_, nTok, nSpans, nMasked, inFp, tgtFp) = out(id)
      val t = text.split(" ")
      assert(nTok == t.length)
      assert(nSpans == t.length / W)
      assert(nMasked == nSpans * L)
      assert(inFp == md5hex(refIn), s"doc $id input diverges: $refIn")
      assert(tgtFp == md5hex(refTgt), s"doc $id target diverges: $refTgt")
    }
  }

  test("short doc passes through unmasked; target is the bare sentinel") {
    val text = "just a few tokens here"
    val dir = plantedDir(Seq((1L, text)))
    val r = TrainQueries.spanCorrupt(spark, dir).head()
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
    assert(r.getString(4) == md5hex(text))
    assert(r.getString(5) == md5hex("<extra_id_0>"))
  }

  test("every span sits inside its window and masks exactly L tokens") {
    // structural property over many ids: offset in [0, W-L]
    (0L until 200L).foreach { id =>
      (0 until 3).foreach { k =>
        val s = spanStart(id, k)
        assert(s >= k * W && s + L <= (k + 1) * W, s"id=$id k=$k s=$s")
      }
    }
  }
}
