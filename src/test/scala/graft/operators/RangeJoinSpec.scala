package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 100L

  private def pairs(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long)]) = {
    val l = left.toDF("event_id", "k", "lts")
    val r = right.toDF("k", "rts")
    RangeJoin.before(l, r, "k", "lts", "rts", W, Map("rts" -> "seen"))
      .select("event_id", "seen").as[(Long, Long)].collect().toSet
  }

  test("matches rows in [lts - W, lts): lower bound inclusive, upper exclusive") {
    val got = pairs(
      left  = Seq((1L, 7L, 1000L)),
      right = Seq((7L, 899L), (7L, 900L), (7L, 950L), (7L, 999L), (7L, 1000L), (7L, 1001L)))
    assert(got == Set((1L, 900L), (1L, 950L), (1L, 999L)))
  }

  test("pairs crossing a bucket-cell boundary are still found, exactly once") {
    // lts=150 (cell 1) matches rts=60 (cell 0) across the boundary
    val got = pairs(
      left  = Seq((1L, 7L, 150L)),
      right = Seq((7L, 60L), (7L, 149L)))
    assert(got == Set((1L, 60L), (1L, 149L)))
  }

  test("no duplicate pairs from the two-cell right-side expansion") {
    val left  = (0L until 50L).map(i => (i, 1L, i * 17L))
    val right = (0L until 50L).map(i => (1L, i * 13L))
    val l = left.toDF("event_id", "k", "lts")
    val r = right.toDF("k", "rts")
    val joined = RangeJoin.before(l, r, "k", "lts", "rts", W, Map("rts" -> "seen"))
      .select("event_id", "seen").as[(Long, Long)].collect().toSeq
    assert(joined.size == joined.toSet.size, "duplicates produced")
    // brute-force ground truth
    val expected = (for {
      (id, _, lts) <- left; (_, rts) <- right
      if rts >= lts - W && rts < lts
    } yield (id, rts)).toSet
    assert(joined.toSet == expected)
  }

  test("keys never cross") {
    val got = pairs(
      left  = Seq((1L, 7L, 1000L)),
      right = Seq((8L, 950L)))
    assert(got.isEmpty)
  }

  test("output carries only left columns plus the renamed payload — no internals") {
    val l = Seq((1L, 7L, 1000L)).toDF("event_id", "k", "lts")
    val r = Seq((7L, 950L)).toDF("k", "rts")
    val out = RangeJoin.before(l, r, "k", "lts", "rts", W, Map("rts" -> "seen"))
    assert(out.columns.toSet == Set("event_id", "k", "lts", "seen"))
  }

  test("reserved internal column names on either input are rejected") {
    val l = Seq((1L, 7L, 1000L)).toDF("event_id", "__cell", "lts")
    val r = Seq((7L, 950L)).toDF("k", "rts")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.before(l, r, "__cell", "lts", "rts", W, Map("rts" -> "seen"))
    }
    assert(e.getMessage.contains("__cell"))
  }

  test("plans as an equi-join on (key, cell), not a cross product") {
    val l = Seq((1L, 7L, 1000L)).toDF("event_id", "k", "lts")
    val r = Seq((7L, 950L)).toDF("k", "rts")
    val plan = RangeJoin.before(l, r, "k", "lts", "rts", W, Map("rts" -> "seen"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
