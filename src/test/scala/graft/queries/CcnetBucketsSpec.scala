package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Structural ground truth for the CCNet-style tercile bucketing: every
  * source's buckets are balanced to within one document, the nll order
  * head ≤ middle ≤ tail holds at the boundaries, and every document is
  * bucketed exactly once.
  */
class CcnetBucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("terciles are balanced per source and ordered by nll") {
    val rows = RetrievalQueries.ccnetBuckets(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long, Double, String)].collect()
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (src, g) =>
      val sizes = g.groupBy(_._5).view.mapValues(_.length).toMap
      assert(Set("head", "middle", "tail").subsetOf(sizes.keySet) || g.length < 3,
        s"source $src missing a bucket with ${g.length} docs")
      if (sizes.size == 3)
        assert(sizes.values.max - sizes.values.min <= 1,
          s"source $src unbalanced: $sizes")
      def maxNll(b: String) = g.filter(_._5 == b).map(_._4).maxOption
      def minNll(b: String) = g.filter(_._5 == b).map(_._4).minOption
      for (h <- maxNll("head"); m <- minNll("middle"))
        assert(h <= m, s"source $src head/middle boundary")
      for (m <- maxNll("middle"); t <- minNll("tail"))
        assert(m <= t, s"source $src middle/tail boundary")
    }
  }
}
