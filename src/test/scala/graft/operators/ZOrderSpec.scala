package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Morton-code correctness (known bit patterns) and the layout claim
  * itself: after [[ZOrder.zorderRepartition]], every partition covers a
  * small RECTANGLE in both dimensions — the per-file min-max tightness
  * that makes parquet scans prunable on either predicate. Compared
  * against a round-robin layout of the same data to keep the assertion
  * honest.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("morton code interleaves bits exactly") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (3L, 5L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.mortonCode(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(3,5): a→bits{0,2}=5, b→bits{1,5}... b=101₂ → odd bits 1,5 and 3 clear → 34
    assert(rows == Seq(0L, 5L | 34L, 0x55555555L, 0xAAAAAAAAL, 0xFFFFFFFFL))
  }

  test("z-ordered partitions are rectangles; round-robin partitions are not") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_partkey", "l_suppkey")

    def avgBoxArea(df: org.apache.spark.sql.DataFrame): Double = {
      val boxes = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(((max("l_partkey") - min("l_partkey")) *
          (max("l_suppkey") - min("l_suppkey"))).as("area"))
        .agg(avg("area")).collect()(0).getDouble(0)
      boxes
    }

    val z = avgBoxArea(ZOrder.zorderRepartition(li, "l_partkey", "l_suppkey", 16))
    val naive = avgBoxArea(li.repartition(16))
    // a random shuffle gives every partition the full (partkey × suppkey)
    // box; the z-layout's average box must be at least 4× tighter
    assert(z * 4 < naive, s"z=$z naive=$naive")
  }
}
