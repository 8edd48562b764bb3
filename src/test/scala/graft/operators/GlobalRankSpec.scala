package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import graft.TestSpark

/** [[Relational.globalRank]] — the two-phase replacement for a global
  * `row_number().over(Window.orderBy(...))`: same ranks, no
  * single-partition WindowExec over the data.
  */
class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("globalRank equals the single-window global row_number") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("k", (col("id") * 37) % 1000) // duplicate sort keys
    val expected = df.withColumn("rk",
        row_number().over(Window.orderBy(col("k").desc, col("id"))).cast("long") - 1)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Relational.globalRank(df, Seq(col("k").desc, col("id")))
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("globalRank is stable across recomputation (deterministic pids)") {
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("k", (col("id") * 13) % 50)
    val ranked = Relational.globalRank(df, Seq(col("k"), col("id")))
    val a = ranked.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = ranked.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a === b)
    // ranks are a permutation of 0..n-1
    assert(a.values.toSeq.sorted === (0L until 5000L))
  }

  test("no unpartitioned WindowExec over the data frame in the plan") {
    val df = spark.range(0, 1000).toDF("id").withColumn("k", col("id") % 7)
    val plan = Relational.globalRank(df, Seq(col("k").desc, col("id")))
      .queryExecution.sparkPlan
    val globalWindows = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    // the only unpartitioned window allowed is the partition-offset
    // cumsum, whose input is the per-pid count aggregate (bounded by
    // the partition count)
    globalWindows.foreach { w =>
      assert(w.child.find {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case _ => false
      }.isDefined, s"unbounded global window:\n$w")
    }
    // and the per-row rank window must be partitioned
    val partitioned = plan.collect {
      case w: WindowExec if w.partitionSpec.nonEmpty => w
    }
    assert(partitioned.nonEmpty)
  }
}
