package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.RuntimeFilters

class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  // selective dim filter + fact join, forced into a shuffle join so the
  // bloom path (not broadcast pruning) is what fires
  private def joined() = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
  }

  test("bloom runtime filter is injected into the fact-side scan") {
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try RuntimeFilters.withBloomPruning(spark) {
      val plan = joined().queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter in plan:\n${plan.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("pruning is results-neutral: identical aggregates on and off") {
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val withBloom = RuntimeFilters.withBloomPruning(spark) { joined().collect() }
      val without = joined().collect()
      assert(withBloom.sameElements(without))
      assert(withBloom.nonEmpty && withBloom.head.getLong(1) > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("confs are restored after the scope, even on failure") {
    val before = spark.conf.getOption(RuntimeFilters.Enabled)
    intercept[RuntimeException] {
      RuntimeFilters.withBloomPruning(spark) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.getOption(RuntimeFilters.Enabled) == before)
  }
}
