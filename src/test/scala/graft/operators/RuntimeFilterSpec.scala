package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Runtime (bloom) filter injection: on a shuffle join where one side is
  * selectively filtered, Spark plants a bloom filter built from the
  * filtered side onto the other side's scan — at 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * ~1% that can possibly match. The spec pins the optimizer behavior
  * (thresholds lowered to fire at test scale).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom filter on the fact side of a shuffle join") {
    val dir = "/root/testdata/sf0.01"
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join shape the filter exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val lineitem = Tables.read(spark, dir, "lineitem")
      val orders = Tables.read(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloomfilter") || plan.contains("might_contain"),
        joined.queryExecution.optimizedPlan.toString.take(3000))
      assert(joined.count() > 0)
    }
  }

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val old = confs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
    }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
