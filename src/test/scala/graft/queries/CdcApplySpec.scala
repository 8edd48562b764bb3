package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the CDC change-log fold: last-writer-wins per key,
  * delete tombstones remove the key entirely, same-day ties break on
  * orderkey, and the churn counters count every change including the
  * tombstones.
  */
class CdcApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ordersDir(
      rows: Seq[(Long, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("last change wins, tombstoned keys vanish, ties break on orderkey") {
    val dir = ordersDir(Seq(
      // cust 1: update then DELETE ('F') — key must vanish
      (10L, 1L, "O", 10.0, "2024-01-01"),
      (11L, 1L, "F", 11.0, "2024-01-02"),
      // cust 2: delete then re-insert — survives with the later price
      (20L, 2L, "F", 19.0, "2024-01-01"),
      (21L, 2L, "O", 20.0, "2024-01-03"),
      // cust 3: single upsert
      (30L, 3L, "P", 30.0, "2024-01-05"),
      // cust 4: same-day tie — higher orderkey (the delete) wins
      (40L, 4L, "O", 40.0, "2024-01-04"),
      (41L, 4L, "F", 41.0, "2024-01-04")))
    val got = WarehouseQueries.cdcApply(spark, dir)
      .select("o_custkey", "price", "n_changes", "n_deletes")
      .as[(Long, Double, Long, Long)].collect().toList
    assert(got == List((2L, 20.0, 2L, 1L), (3L, 30.0, 1L, 0L)))
  }

  test("same-day tie with the UPSERT at the higher orderkey keeps the key") {
    val dir = ordersDir(Seq(
      (50L, 5L, "F", 50.0, "2024-02-01"),
      (51L, 5L, "O", 51.0, "2024-02-01")))
    val got = WarehouseQueries.cdcApply(spark, dir)
      .select("o_custkey", "price").as[(Long, Double)].collect().toList
    assert(got == List((5L, 51.0)))
  }

  test("rfm_segment: distinct frequency/monetary ladder maps to quartile " +
       "scores 1-4; equal recency collapses every r_score to 1") {
    // customer k places k orders of 100.00 on the shared anchor day:
    // r identical (score 1 for all), f and m strictly increasing
    val rows = for (k <- 1 to 4; i <- 1 to k)
      yield ((k * 10 + i).toLong, k.toLong, "O", 100.0, "2024-03-01")
    val dir = ordersDir(rows)
    val got = WarehouseQueries.rfmSegment(spark, dir)
      .select("o_custkey", "r", "f", "segment")
      .as[(Long, Long, Long, String)].collect().toList
    assert(got == List(
      (1L, 0L, 1L, "111"), (2L, 0L, 2L, "122"),
      (3L, 0L, 3L, "133"), (4L, 0L, 4L, "144")))
  }
}
