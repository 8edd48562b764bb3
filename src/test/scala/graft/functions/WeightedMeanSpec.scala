package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.udaf
import graft.TestSpark

class WeightedMeanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weighted mean matches hand computation and is partition-order invariant") {
    val data = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 6.0))
    val expected = data.map { case (v, w) => v * w }.sum / data.map(_._2).sum

    val wm = udaf(WeightedMean)
    val one  = data.toDF("v", "w").coalesce(1)
      .agg(wm($"v", $"w")).head().getDouble(0)
    val many = data.toDF("v", "w").repartition(5)
      .agg(wm($"v", $"w")).head().getDouble(0)

    assert(math.abs(one - expected) < 1e-9)
    assert(one == many) // integer-scaled buffer: merge order cannot matter
  }

  test("zero total weight yields NaN") {
    val wm = udaf(WeightedMean)
    import org.apache.spark.sql.functions.col
    val out = Seq((1.0, 0.0)).toDF("v", "w")
      .agg(wm(col("v"), col("w"))).head().getDouble(0)
    assert(out.isNaN)
  }
}
