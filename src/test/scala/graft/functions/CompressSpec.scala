package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.unsafe.types.UTF8String

class CompressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r(s: String): Double = Compress.ratio(UTF8String.fromString(s))

  test("planted extremes: runs compress hard, high-entropy text barely") {
    val runs = "ab" * 5000
    assert(r(runs) < 0.02, s"run ratio ${r(runs)}")
    // LCG high bits — ~6 bits/char of real entropy, no long-range repeats
    var x = 0x9e3779b97f4a7c15L
    val entropy = (1 to 4000).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 40) & 63) + 33).toChar
    }.mkString
    assert(r(entropy) > 0.5, s"entropy ratio ${r(entropy)}")
    assert(r("") == 1.0)
  }

  test("unicode text measures UTF-8 bytes, not chars") {
    val uni = "ñá€漢字" * 400
    assert(r(uni) < 0.1) // repeated block is still redundant
    assert(r(uni) > 0.0)
  }

  test("expression matches kernel and survives repartitioning") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spam spam spam spam spam spam spam spam spam spam"),
      (3L, "x"),
      (4L, ""))
    val df = docs.toDF("id", "text")
    val viaExpr = df.repartition(3)
      .select($"id", Compress.deflateRatio($"text").as("ratio"))
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    docs.foreach { case (id, text) =>
      assert(viaExpr(id) == r(text), s"doc $id")
    }
    // repetitive doc ranks below the natural sentence
    assert(viaExpr(2L) < viaExpr(1L))
  }

  test("deflateLen expression agrees with the ratio kernel") {
    val docs = Seq((1L, "abc " * 200), (2L, "z"), (3L, ""))
    val got = docs.toDF("id", "text").repartition(2)
      .select($"id", Compress.deflateLen($"text").as("dl"),
        octet_length($"text").cast("long").as("raw"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.foreach { case (id, text) =>
      val (dl, raw) = got(id)
      assert(raw == text.getBytes("UTF-8").length.toLong)
      if (raw == 0) assert(dl == 0L)
      else assert(math.abs(dl.toDouble / raw - r(text)) < 1e-9, s"doc $id")
    }
  }

  test("compress_ratio query: schema, determinism, and structural invariants") {
    val q1 = graft.queries.TextQueries.compressRatio(spark, "/root/testdata/sf0.001")
    val rows1 = q1.collect()
    val rows2 = graft.queries.TextQueries.compressRatio(spark, "/root/testdata/sf0.001").collect()
    assert(rows1.nonEmpty)
    assert(rows1.sameElements(rows2), "non-deterministic output")
    rows1.foreach { row =>
      assert(row.getLong(1) > 0L, "raw_len")
      assert(row.getLong(2) == 1L, s"deflate invariant violated for ${row.get(0)}")
    }
  }

  test("repetitive verdict via the Column API ranks templated text low") {
    val df = Seq((1L, "spam " * 400), (2L, "the quick brown fox " * 2))
      .toDF("id", "text")
      .select($"id", Compress.deflateRatio($"text").as("ratio"))
      .select($"id", $"ratio", ($"ratio" < 0.35).cast("long").as("repetitive"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(df(1L) == 1L)
  }
}
