package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the UL2 mixture: the md5 die routes every document
  * to exactly one denoiser, R rows are bit-identical to `span_corrupt`
  * on the shared documents, the S branch's cut stays in the middle
  * half, and an independent S reference reproduces the fingerprints.
  */
class Ul2MixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h(docId: Long, tag: String): Long =
    java.lang.Long.parseLong(md5hex(s"$docId:$tag").substring(0, 8), 16)

  test("every doc routed once; R rows equal span_corrupt; S cut in middle half") {
    val dir = "/root/testdata/sf0.001"
    val mix = TrainQueries.ul2Mix(spark, dir)
      .as[(Long, String, Long, Long, String, String)].collect()
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(mix.length == texts.size)
    assert(mix.map(_._1).distinct.length == mix.length)
    // routing matches the md5 die
    mix.foreach { case (id, den, _, _, _, _) =>
      val d = h(id, "ul2") % 4
      val expected = if (d <= 1) "R" else if (d == 2) "X" else "S"
      assert(den == expected, s"doc $id routed to $den, expected $expected")
    }
    // R rows are bit-identical to span_corrupt on the shared docs
    val sc = TrainQueries.spanCorrupt(spark, dir)
      .select("doc_id", "n_masked", "input_fp", "target_fp")
      .as[(Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    mix.filter(_._2 == "R").foreach { case (id, _, _, nm, inFp, tgtFp) =>
      assert(sc(id) == ((nm, inFp, tgtFp)), s"R doc $id diverges from span_corrupt")
    }
    // S branch: independent reference
    mix.filter(_._2 == "S").foreach { case (id, _, nTok, nMasked, inFp, tgtFp) =>
      val t = texts(id).trim.split("\\s+", -1)
      val n = t.length.toLong
      val lo = n / 4
      val cut = (lo + h(id, "s") % (n - lo * 2 + 1)).toInt
      assert(cut >= lo && cut <= n - lo, s"S doc $id cut outside middle half")
      assert(nMasked == n - cut)
      val refIn = (t.slice(0, cut) :+ "<extra_id_0>").mkString(" ")
      val refTgt = ("<extra_id_0>" +: t.slice(cut, n.toInt)).mkString(" ")
      assert(inFp == md5hex(refIn) && tgtFp == md5hex(refTgt), s"S doc $id")
      assert(nTok == n)
    }
    // all three denoisers actually occur on 500 docs
    assert(Set("R", "X", "S").subsetOf(mix.map(_._2).toSet))
  }

  test("X branch masks half of every full 16-token window") {
    val dir = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    TrainQueries.ul2Mix(spark, dir)
      .where(col("denoiser") === "X")
      .select("doc_id", "n_tok", "n_masked")
      .as[(Long, Long, Long)].collect()
      .foreach { case (id, nTok, nMasked) =>
        val n = texts(id).trim.split("\\s+", -1).length
        assert(nTok == n)
        assert(nMasked == (n / 16).toLong * 8, s"doc $id")
      }
  }
}
