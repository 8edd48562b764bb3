package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.CmsAgg

/** Task-retry resilience: on a real cluster tasks fail and re-run, and
  * Spark's contract is that a failed attempt's partial output is
  * DISCARDED — aggregates see each row exactly once. This spec plants a
  * mid-stream crash in partition 0's first attempt (half the rows
  * already emitted, then an exception) and asserts exact results
  * through both a plain sum and the CMS Aggregator, plus an
  * accumulator witness that the failure genuinely fired and a retry
  * genuinely ran.
  */
object RetryResilienceSpec {
  // accumulator updates from FAILED attempts are discarded by design, so
  // the witness that the crash fired must live outside Spark: a static
  // JVM counter (executors share this JVM in local mode)
  val crashes = new java.util.concurrent.atomic.AtomicInteger(0)
}

class RetryResilienceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mid-stream task failure + retry does not double-count aggregates") {
    import spark.implicits._
    RetryResilienceSpec.crashes.set(0)
    val df = spark.range(0, 1000).repartition(4).as[Long]
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
          val buf = it.toVector
          val crash: Iterator[Long] = new Iterator[Long] {
            def hasNext = true
            def next(): Long = {
              RetryResilienceSpec.crashes.incrementAndGet()
              throw new RuntimeException("planted task failure")
            }
          }
          buf.iterator.take(buf.size / 2) ++ crash
        } else it
      }

    val agg = df.toDF("v").agg(
      count(lit(1)).as("n"), sum("v").as("s"),
      countDistinct("v").as("nd")).head()
    assert(agg.getLong(0) == 1000L)
    assert(agg.getLong(1) == 499500L)     // Σ 0..999 — no dropped or doubled rows
    assert(agg.getLong(2) == 1000L)
    assert(RetryResilienceSpec.crashes.get() >= 1,
      "planted failure never fired — retry untested")

    // the sketch path: every row contributes exactly depth increments
    val D = 4; val W = 64
    val cms = udaf(new CmsAgg(D, W))
    val idxs = array((0 until D).map(i =>
      pmod(xxhash64(col("v"), lit(i)), lit(W)).cast("int")): _*)
    val sk = df.toDF("v").agg(cms(idxs).as("sk"))
      .head().getSeq[Long](0)
    assert(sk.sum == 1000L * D, s"counter mass ${sk.sum} != ${1000 * D}")
  }
}
