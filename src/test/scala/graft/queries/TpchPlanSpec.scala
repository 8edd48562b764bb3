package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Plan-shape checks for the adapted TPC-H batch ([[TpchQueries]]):
  * the properties that make each query survive a 100 TB scale-up —
  * dimension joins stay broadcast, scalar subqueries stay one-row
  * broadcasts (never a shuffled cartesian), and selective date
  * predicates reach the parquet scan.
  */
class TpchPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def planFormatted(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("no TPC-H query plans a shuffled cartesian product") {
    for (name <- TpchQueries.queries.keys.toSeq.sorted) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: cartesian\n${p.take(1500)}")
    }
  }

  test("one-row scalar subqueries are the ONLY nested-loop joins") {
    // q11 (grand total), q15 (max revenue), q22 (global avg) broadcast a
    // single-row frame — BNLJ there is the intended shape. Everything
    // else must hash-join.
    val allowBnlj = Set("q11_important_parts", "q15_top_supplier", "q22_global_sales")
    for (name <- TpchQueries.queries.keys.toSeq.sorted if !allowBnlj(name)) {
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name: BNLJ\n${p.take(1500)}")
    }
  }

  test("dimension joins are broadcast in the multi-dim queries") {
    for (name <- Seq("q7_volume_shipping", "q8_market_share", "q9_product_profit",
        "q14_promo_revenue", "q16_supplier_cnt", "q19_disjunctive", "q2_min_acct_supplier")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: no broadcast join\n${p.take(1500)}")
    }
  }

  test("q14's ship-date window reaches the parquet scan") {
    val p = planFormatted("q14_promo_revenue")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      p.take(3000))
  }

  test("q4 runs its EXISTS as a semi hash join, not a subquery rescan") {
    assert(plan("q4_priority_late").contains("LeftSemi"), plan("q4_priority_late").take(1500))
  }

  test("q21 evaluates EXISTS/NOT-EXISTS as per-order count aggregates") {
    // the rewrite ships two small per-order frames (partial-aggregated
    // counts) instead of re-shuffling the (order, supplier) projection
    // through inequality semi/anti probes
    val p21 = plan("q21_late_suppliers")
    assert(p21.contains("LeftSemi") && !p21.contains("LeftAnti"), p21.take(2000))
    assert(p21.contains("partial_count"), p21.take(2000))
  }

  test("q13 plans two hash aggregations, no window") {
    val p = plan("q13_custdist")
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("HashAggregate"), p.take(1500))
  }
}
