package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.{SparkEntry, TestSpark}

/** Surface-wide audit: column pruning must reach every parquet scan of
  * the WIDE tables. A scan whose ReadSchema is the full table when the
  * query uses a projection is wasted I/O that small-SF gates never
  * notice — at 100 TB the difference between reading 2 columns and 11
  * is the job. Rather than assert minimality (unknowable from the
  * plan), the audit asserts the pruning MECHANISM works end-to-end:
  * any query scanning lineitem (11 cols) or documents (5 cols,
  * `text` dominating bytes) with the FULL schema must be whitelisted
  * with a justification that it genuinely consumes every column.
  */
class ScanPruningAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** table name -> column count; only wide/heavy tables audited. */
  private val audited = Map("lineitem" -> 11, "documents" -> 5)

  /** query -> justification for a full-width scan. */
  private val whitelist: Map[String, String] = Map.empty

  test("column pruning reaches every wide-table parquet scan, any query") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.sparkPlan
        val bad = plan.collect {
          case s: FileSourceScanExec =>
            val table = s.relation.location.rootPaths.headOption
              .map(_.getName.stripSuffix(".parquet")).getOrElse("")
            audited.get(table).collect {
              case width if s.requiredSchema.size >= width => table
            }
        }.flatten
        if (bad.nonEmpty) Some(s"$name(${bad.distinct.mkString("+")})") else None
    }
    val unexplained =
      offenders.filterNot(o => whitelist.contains(o.takeWhile(_ != '(')))
    assert(unexplained.isEmpty,
      s"full-width wide-table scan in: ${unexplained.mkString(", ")}")
  }
}
