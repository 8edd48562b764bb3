package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ApproxQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sketch quantiles land within the p±0.05 exact-rank bounds; exact values round-trip") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = ExtendedQueries.approxQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("p50_in_bounds") == 1L, s"${r.get(0)}: p50 sketch out of bounds")
      assert(r.getAs[Long]("p90_in_bounds") == 1L, s"${r.get(0)}: p90 sketch out of bounds")
    }
    // the emitted exact quantiles agree with a directly-computed percentile
    val exact = graft.sources.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(round(percentile(col("value"), lit(0.5)), 6).as("p50"),
        round(percentile(col("value"), lit(0.9)), 6).as("p90"))
      .as[(String, Double, Double)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    rows.foreach { r =>
      val (e50, e90) = exact(r.getAs[String]("event_type"))
      assert(r.getAs[Double]("p50_exact") == e50)
      assert(r.getAs[Double]("p90_exact") == e90)
    }
  }
}
