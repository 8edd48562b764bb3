package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the FIM transform: an independent re-derivation of
  * the deterministic cut contract must reproduce the engine's output
  * fingerprints on planted docs AND the whole sf0.001 corpus, and the
  * edge geometries (cuts at 0 / n, equal cuts) must collapse cleanly.
  */
class FimTransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plantedDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fim").toString
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

  private def h(docId: Long, tag: String): Long =
    java.lang.Long.parseLong(md5hex(s"$docId:$tag").substring(0, 8), 16)

  /** The cut contract, re-derived. */
  private def reference(docId: Long, text: String): (Boolean, String) = {
    val t = text.trim.split("\\s+", -1)
    val n = t.length
    val fim = h(docId, "fim") % 2 == 0
    if (!fim) (false, t.mkString(" "))
    else {
      val c1 = h(docId, "a") % (n + 1)
      val c2 = h(docId, "b") % (n + 1)
      val lo = math.min(c1, c2).toInt
      val hi = math.max(c1, c2).toInt
      val out = (Seq("<PRE>") ++ t.slice(0, lo) ++ Seq("<SUF>") ++
        t.slice(hi, n) ++ Seq("<MID>") ++ t.slice(lo, hi)).mkString(" ")
      (true, out)
    }
  }

  test("engine equals the reference on the whole sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val out = TrainQueries.fimTransform(spark, dir)
      .select("doc_id", "fim", "out_fp").as[(Long, Boolean, String)]
      .collect()
    assert(out.nonEmpty)
    var nFim = 0
    out.foreach { case (id, fim, fp) =>
      val (refFim, refOut) = reference(id, texts(id))
      assert(fim == refFim, s"doc $id fim flag")
      assert(fp == md5hex(refOut), s"doc $id output diverges")
      if (fim) nFim += 1
    }
    // the md5 coin should land near half
    assert(nFim > out.length / 4 && nFim < out.length * 3 / 4)
  }

  test("length accounting: pre+mid+suf = n_tok on FIM docs") {
    val dir = plantedDir((0L until 40L).map(i =>
      (i, (1 to 12).map(j => s"t${i}_$j").mkString(" "))))
    TrainQueries.fimTransform(spark, dir).collect().foreach { r =>
      val (n, pre, mid, suf) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(pre + mid + suf == n, s"doc ${r.getLong(0)}")
      if (!r.getBoolean(1)) assert(pre == n && mid == 0 && suf == 0)
    }
  }

  test("edge cuts collapse cleanly: empty prefix/middle/suffix allowed") {
    // scan doc_ids for planted edge geometries under the md5 contract
    val n = 6
    val ids = (0L until 3000L).filter(id => h(id, "fim") % 2 == 0)
    def cuts(id: Long) = {
      val c1 = h(id, "a") % (n + 1); val c2 = h(id, "b") % (n + 1)
      (math.min(c1, c2).toInt, math.max(c1, c2).toInt)
    }
    val emptyPre = ids.find(cuts(_)._1 == 0)
    val emptySuf = ids.find(cuts(_)._2 == n)
    val emptyMid = ids.find(id => { val (a, b) = cuts(id); a == b })
    assert(emptyPre.isDefined && emptySuf.isDefined && emptyMid.isDefined)
    val picked = Seq(emptyPre.get, emptySuf.get, emptyMid.get).distinct
    val text = (1 to n).map(j => s"w$j").mkString(" ")
    val dir = plantedDir(picked.map(id => (id, text)))
    val out = TrainQueries.fimTransform(spark, dir)
      .select("doc_id", "out_fp").as[(Long, String)].collect().toMap
    picked.foreach { id =>
      val (_, refOut) = reference(id, text)
      assert(out(id) == md5hex(refOut), s"edge doc $id")
    }
  }
}
