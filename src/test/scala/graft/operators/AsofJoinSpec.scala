package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    val l = left.toDF("id", "k", "ts")
    val r = right.toDF("r_id", "k", "r_ts")
    AsofJoin(l, r, key = "k", leftTs = "ts", rightTs = "r_ts", leftSeq = "id",
      rightPayload = Map("r_id" -> "r_id", "r_ts" -> "r_ts"))
      .select("id", "r_id").as[(Long, Long)].collect().toSet
  }

  test("picks the latest strictly-earlier right row per key") {
    val got = run(
      left  = Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 300L)),
      right = Seq((10L, 7L, 50L), (11L, 7L, 150L), (12L, 7L, 250L)))
    assert(got == Set((1L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("equal timestamps do NOT match (strict inequality)") {
    val got = run(
      left  = Seq((1L, 7L, 100L)),
      right = Seq((10L, 7L, 100L)))
    assert(got.isEmpty)
  }

  test("left rows with no earlier right row are dropped (inner as-of)") {
    val got = run(
      left  = Seq((1L, 7L, 50L), (2L, 7L, 200L)),
      right = Seq((10L, 7L, 100L)))
    assert(got == Set((2L, 10L)))
  }

  test("leftOuter keeps unmatched left rows with NULL payload") {
    val l = Seq((1L, 7L, 50L), (2L, 7L, 200L)).toDF("id", "k", "ts")
    val r = Seq((10L, 7L, 100L)).toDF("r_id", "k", "r_ts")
    val got = AsofJoin(l, r, key = "k", leftTs = "ts", rightTs = "r_ts",
        leftSeq = "id", rightPayload = Map("r_id" -> "r_id"), leftOuter = true)
      .select("id", "r_id").as[(Long, Option[Long])].collect().toSet
    assert(got == Set((1L, None), (2L, Some(10L))))
  }

  test("keys never cross") {
    val got = run(
      left  = Seq((1L, 7L, 200L), (2L, 8L, 200L)),
      right = Seq((10L, 7L, 100L)))
    assert(got == Set((1L, 10L)))
  }

  test("right rows tied on (key, ts) resolve deterministically to the largest rightSeq") {
    val l = Seq((1L, 7L, 100L)).toDF("id", "k", "ts")
    // three right rows at the same instant: the seq tiebreak must pick 12
    val r = Seq((11L, 7L, 50L), (12L, 7L, 50L), (10L, 7L, 50L)).toDF("r_id", "k", "r_ts")
    (1 to 5).foreach { _ =>
      val got = AsofJoin(l, r.repartition(4), "k", "ts", "r_ts", "id",
        Map("r_id" -> "r_id"), rightSeq = Some("r_id"))
        .select("id", "r_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 12L)))
    }
  }

  test("reserved internal column names on either input are rejected") {
    val l = Seq((1L, 7L, 100L)).toDF("id", "k", "__ts")
    val r = Seq((10L, 7L, 50L)).toDF("r_id", "k", "r_ts")
    val e = intercept[IllegalArgumentException] {
      AsofJoin(l, r, "k", "__ts", "r_ts", "id", Map("r_id" -> "r_id"))
    }
    assert(e.getMessage.contains("__ts"))
  }

  test("single shuffle on the key: no range or nested-loop join in the plan") {
    val l = Seq((1L, 7L, 100L)).toDF("id", "k", "ts")
    val r = Seq((10L, 7L, 50L)).toDF("r_id", "k", "r_ts")
    val plan = AsofJoin(l, r, "k", "ts", "r_ts", "id",
      Map("r_id" -> "r_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("asof_nearest: picks the closer side, prev on |gap| ties, next-only " +
       "and no-match users handled") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-asofnear").toString
    // per user: (purchase ts, signup tss)
    // u1: 100 vs {90, 105}  → next (gap −5)
    // u2: 100 vs {95, 105}  → |5| tie → prev (gap +5)
    // u3: 100 vs {200}      → next (gap −100)
    // u4: 100 vs {}         → NULL side
    val us = 1000L // µs → ns
    val rows = Seq(
      (1L, 100L, 1L, "purchase"), (2L, 90L, 1L, "signup"), (3L, 105L, 1L, "signup"),
      (4L, 100L, 2L, "purchase"), (5L, 95L, 2L, "signup"), (6L, 105L, 2L, "signup"),
      (7L, 100L, 3L, "purchase"), (8L, 200L, 3L, "signup"),
      (9L, 100L, 4L, "purchase"))
    rows.map { case (e, t, u, ty) => (e, t * us, u, ty) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.AdvancedQueries.asofNearestQ(spark, dir)
      .select("event_id", "side", "near_event", "gap_us")
      .as[(Long, Option[String], Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, Some("next"), Some(3L), Some(-5L)),
      (4L, Some("prev"), Some(5L), Some(5L)),
      (7L, Some("next"), Some(8L), Some(-100L)),
      (9L, None, None, None)))
  }
}
