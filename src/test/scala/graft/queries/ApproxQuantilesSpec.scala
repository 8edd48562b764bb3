package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ApproxQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sketch quantiles land within the accuracy bound of the exact values") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val approx = ExtendedQueries.approxQuantiles(spark, dir)
      .as[(String, Double, Double)].collect().toMap2
    val exact = graft.sources.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.9)).as("p90"))
      .as[(String, Double, Double)].collect().toMap2
    assert(approx.keySet == exact.keySet)
    // accuracy 1000 on ~200 rows/group: the sketch is near-exact; allow
    // a generous rank-error margin via the value spread
    exact.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = approx(k)
      val spread = math.max(1e-9, math.abs(e90 - e50))
      assert(math.abs(a50 - e50) <= spread, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= spread, s"$k p90: $a90 vs $e90")
    }
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map { case (a, b, c) => a -> (b, c) }.toMap
  }
}
