package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class NgramHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hashOf(tokens: Seq[String], start: Int, n: Int): Long =
    Seq(Tuple1(tokens)).toDF("t")
      .select(NgramKernels.ngramHashCol(col("t"), lit(start), n).as("h"))
      .as[Long].head()

  test("deterministic and sensitive to every token in the window") {
    val base = hashOf(Seq("a", "b", "c", "d"), 0, 3)
    assert(base == hashOf(Seq("a", "b", "c", "d"), 0, 3))
    assert(base != hashOf(Seq("x", "b", "c", "d"), 0, 3))
    assert(base != hashOf(Seq("a", "b", "x", "d"), 0, 3))
    assert(base != hashOf(Seq("a", "b", "c", "d"), 1, 3))
  }

  test("token boundaries matter: (ab,c) differs from (a,bc)") {
    assert(hashOf(Seq("ab", "c"), 0, 2) != hashOf(Seq("a", "bc"), 0, 2))
  }

  test("out-of-range tail positions are skipped, matching concat_ws on short docs") {
    // window hangs off the end: only the in-range tokens feed the hash,
    // so an n=3 window over a tail equals the exact-length window
    assert(hashOf(Seq("a", "b"), 1, 3) == hashOf(Seq("z", "b"), 1, 3))
    assert(hashOf(Seq("only"), 0, 3) == hashOf(Seq("only"), 0, 1))
  }

  test("interpreted eval agrees with codegen") {
    val df = (0 until 100).map(i => Tuple1(Seq.tabulate(5)(j => s"w${(i + j) % 7}"))).toDF("t")
    val viaCodegen = df.select(NgramKernels.ngramHashCol(col("t"), lit(1), 3).as("h"))
      .as[Long].collect().toSeq
    val viaKernel = (0 until 100).map { i =>
      val toks = Seq.tabulate(5)(j => s"w${(i + j) % 7}")
      NgramKernels.hash(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray), 1, 3)
    }
    assert(viaCodegen == viaKernel)
  }

  test("dedup_ngram semantics unchanged by the hash swap (planted near-dups found)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s"),
      (2L, "the quick brown fox jumps over the lazy cat", "s"),
      (3L, "completely different words here entirely now", "s"))
      .toDF("doc_id", "text", "source")
    val grams = graft.operators.Dedup.explodedNgrams(docs, "doc_id", "text", 3)
    val pairs = graft.operators.Dedup.verifyJaccard(
      grams.as("a").join(grams.as("b"),
          col("a.gh") === col("b.gh") && col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id")).distinct(),
      grams, threshold = 0.5)
    assert(pairs.select("a_id", "b_id").as[(Long, Long)].collect().toSet == Set((1L, 2L)))
  }
}
