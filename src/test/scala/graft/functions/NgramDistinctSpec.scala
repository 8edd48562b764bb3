package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The fused distinct-gram kernel must agree exactly with the
  * composable HOF form it replaces (size ∘ array_distinct ∘ transform ∘
  * ngram_hash); NgramDistinctProps sweeps random arrays against the
  * semantic token-slice reference.
  */
class NgramDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kernel(tokens: Seq[String], n: Int): Long =
    Seq(Tuple1(tokens)).toDF("t")
      .select(NgramDistinctKernels.ngramDistinctCol(col("t"), n).as("d"))
      .as[Long].head()

  private def viaHof(tokens: Seq[String], n: Int): Long =
    Seq(Tuple1(tokens)).toDF("t")
      .select(size(array_distinct(transform(
        sequence(lit(0), greatest(size(col("t")) - n, lit(0))),
        i => NgramKernels.ngramHashCol(col("t"), i, n)))).cast("long").as("d"))
      .as[Long].head()

  test("repeated trigram collapses; tail grams shorten like concat_ws") {
    // grams: abc bca cab abc -> 3 distinct of 4
    assert(kernel(Seq("a", "b", "c", "a", "b", "c"), 3) == 3L)
    assert(kernel(Seq("a", "a", "a", "a"), 3) == 1L)
    assert(kernel(Seq("a"), 3) == 1L)   // single shortened tail gram
  }

  test("agrees with the composable HOF form it replaces") {
    for (ts <- Seq(Seq("a"), Seq("a", "b"), Seq("x", "x", "x", "y", "x"),
           Seq("ab", "c", "a", "bc"), (1 to 40).map(i => s"t${i % 7}"));
         n <- Seq(1, 2, 3))
      assert(kernel(ts, n) == viaHof(ts, n), s"ts=$ts n=$n")
  }
}
