package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MiscQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct lands within 5% of exact on every group") {
    val rows = MiscQueries.approxDistinct(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_customers") > 0)
      assert(r.getAs[Long]("within_5pct") == 1L,
        s"group ${r.get(0)}: HLL estimate outside 5% of ${r.get(1)}")
    }
  }

  test("preview caps at 50 rows and 8 columns") {
    val df = MiscQueries.previewHead(spark, "/root/testdata/sf0.001")
    assert(df.columns.length <= 8)
    assert(df.count() <= 50)
  }
}
