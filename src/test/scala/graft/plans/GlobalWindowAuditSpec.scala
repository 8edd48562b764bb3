package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalTableScanExec, RDDScanExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import graft.{SparkEntry, TestSpark}

/** Surface-wide audit: no query may plan an UNPARTITIONED WindowExec
  * whose input is data-scale. `Window.orderBy(...)` with no partition
  * key moves the whole frame to ONE reducer — correct at any SF, a
  * scale-killer at 100 TB (the round-8 `shard_plan` finding).
  *
  * An unpartitioned WindowExec is acceptable only when its input is
  * structurally BOUNDED before the window: an aggregate over a
  * low-cardinality key (sources / days / buckets / partition ids), a
  * global limit, or a literal local relation below it caps the rows
  * the single reducer ever sees. The audit walks every registered
  * query's pre-AQE physical plan; any unpartitioned window with no
  * bounding node below it must appear in the hand-audited whitelist —
  * a NEW doc-scale global window fails this test at introduction time.
  */
class GlobalWindowAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Queries hand-audited as safe despite an unpartitioned window with
    * no aggregate/limit below it in the plan (each bounded by input
    * construction, not by plan shape). Keep this list JUSTIFIED.
    */
  private val whitelist: Map[String, String] = Map(
    // The reference's 1-based send ordinal (W1): a sequential queue
    // number over the outgoing-mail roster. The frame is the mailing
    // list — operationally bounded (people, not corpus documents) and
    // the global order IS the operator's semantics (app.py send loop).
    "send_plan" -> "mail-roster ordinal, reference W1 semantics")

  private def bounded(p: SparkPlan): Boolean = p.find {
    case _: BaseAggregateExec => true // grouped agg caps rows at key card.
    case _: GlobalLimitExec => true
    case _: LocalTableScanExec => true // literal frames (calendars, dims)
    case _: RDDScanExec => true // checkpointed tiny frames
    // rank-limit pushdown: each upstream partition truncates to k rows
    // BEFORE the single-partition final window, so the one reducer sees
    // <= k * numPartitions rows — the top-k-by-global-rank shape
    case _: WindowGroupLimitExec => true
    // the optimizer's rank-limit rewrite for UNPARTITIONED windows:
    // Filter(row_number <= k) over Window.orderBy plans a distributed
    // top-k below the single-partition window, which then re-ranks only
    // k rows (the rrf_fusion shape)
    case _: TakeOrderedAndProjectExec => true
    case _ => false
  }.isDefined

  test("no unpartitioned WindowExec over an unbounded frame, any query") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.sparkPlan
        val bad = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) => w
        }
        if (bad.nonEmpty) Some(name) else None
    }
    val unexplained = offenders.filterNot(whitelist.contains)
    assert(unexplained.isEmpty,
      s"doc-scale unpartitioned WindowExec in: ${unexplained.mkString(", ")}")
  }
}
