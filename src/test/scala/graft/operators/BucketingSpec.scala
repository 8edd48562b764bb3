package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The co-located-join pattern: bucketed tables joined on the bucket key
  * need NO shuffle at read time — the partitioning is persisted. This is
  * the main repeated-join lever at 100 TB: pay one shuffle at write,
  * reuse it for every downstream join.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed equi-join has no shuffle exchange in the plan") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
      col("o_orderkey") === col("l_orderkey"))
    val rows = joined.count()
    assert(rows > 0)

    // Force a non-broadcast join to see whether the bucketing removed the
    // shuffle: with both sides bucketed on the join key there must be no
    // Exchange below the SortMergeJoin.
    val noBroadcast = spark.table("b_orders").hint("merge").join(
      spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
    val plan = noBroadcast.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), plan)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
