package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Planning semantics on a hand-built validated frame, plus the fixture
  * wiring (`enrol_plan`) on the real sf0.001 tables.
  */
class EnrolPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (missing, dup, username_final, rut, email) — validated-frame shape
  private def validated(rows: Seq[(Long, Long, String, String, String)]) =
    rows.toDF("missing_required", "duplicate_rut", "username_final", "rut", "email")

  private def courses(rows: Seq[(Long, String, Long)]) =
    rows.toDF("course_id", "course", "capacity")

  private def run(v: Seq[(Long, Long, String, String, String)],
                  enrolled: Seq[(Long, Long)],
                  cat: Seq[(Long, String, Long)]) = {
    val custkey = split(col("rut"), "-").getItem(0).cast("long")
    EnrolPlan(validated(v), custkey % 2,
        enrolled.toDF("custkey", "course_id"), custkey, courses(cat))
      .orderBy("course_id", "seat")
      .as[(Long, String, Long, Long, String, String, String, String)]
      .collect().toSeq
  }

  test("invalid rows and already-enrolled pairs never reach a seat") {
    val out = run(
      v = Seq(
        (0L, 0L, "ana",   "10-0", "a@x"),  // custkey 10 → course 0
        (1L, 0L, "bad1",  "11-0", "b@x"),  // missing_required → out
        (0L, 1L, "bad2",  "12-0", "c@x"),  // duplicate_rut → out
        (0L, 0L, "carla", "13-0", "d@x"),  // course 1, already enrolled → out
        (0L, 0L, "diego", "15-0", "e@x")), // course 1, fresh
      enrolled = Seq((13L, 1L)),
      cat = Seq((0L, "C0", 5L), (1L, "C1", 5L)))
    assert(out.map(r => (r._1, r._6)) == Seq((0L, "ana"), (1L, "diego")))
    assert(out.forall(_._5 == "enrolled"))
  }

  test("seat ordinal is per-course by username; capacity splits the status") {
    val out = run(
      v = Seq( // all course 0 (even custkeys), usernames out of order
        (0L, 0L, "zoe", "2-0", "z@x"),
        (0L, 0L, "ana", "4-0", "a@x"),
        (0L, 0L, "mia", "6-0", "m@x"),
        (0L, 0L, "bea", "8-0", "b@x")),
      enrolled = Seq.empty,
      cat = Seq((0L, "C0", 2L)))
    // seats follow username order: ana=1, bea=2 enrolled; mia=3, zoe=4 wait
    assert(out.map(r => (r._6, r._4, r._5)) == Seq(
      ("ana", 1L, "enrolled"), ("bea", 2L, "enrolled"),
      ("mia", 3L, "waitlist"), ("zoe", 4L, "waitlist")))
  }

  test("a candidate whose course is missing from the catalog surfaces " +
       "as unassigned instead of vanishing") {
    val custkey = split(col("rut"), "-").getItem(0).cast("long")
    val out = EnrolPlan(
        validated(Seq(
          (0L, 0L, "ana", "10-0", "a@x"),   // course 0 — catalogued
          (0L, 0L, "bea", "13-0", "b@x"))), // course 1 — NOT in catalog
        custkey % 2,
        Seq.empty[(Long, Long)].toDF("custkey", "course_id"),
        custkey, courses(Seq((0L, "C0", 5L))))
      .orderBy("course_id")
      .collect()
    assert(out.map(r => (r.getAs[String]("username"),
      r.getAs[String]("status"))).toSeq ==
      Seq(("ana", "enrolled"), ("bea", "unassigned")))
    assert(out(1).isNullAt(out(1).fieldIndex("capacity")))
  }

  test("fixture wiring: all three statuses fire at sf0.001, seats are dense") {
    val out = graft.queries.EtlQueries.enrolPlan(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val statuses = out.map(_.getAs[String]("status")).toSet
    // course_id 6 is the deliberate catalog gap (EnrolCatalog = 6 < 7
    // derived courses), so the unassigned branch must fire here too
    assert(statuses == Set("enrolled", "waitlist", "unassigned"),
      s"all three statuses must fire; got $statuses")
    // per-course seats are a dense 1..n sequence, none past seat order
    out.groupBy(_.getAs[Long]("course_id")).foreach { case (cid, rows) =>
      val seats = rows.map(_.getAs[Long]("seat")).sorted.toSeq
      assert(seats == (1L to seats.length.toLong), s"course $cid seats")
      rows.foreach { r =>
        val expect =
          if (r.isNullAt(r.fieldIndex("capacity"))) "unassigned"
          else if (r.getAs[Long]("seat") <= r.getAs[Long]("capacity"))
            "enrolled" else "waitlist"
        assert(r.getAs[String]("status") == expect)
      }
    }
    // usernames are globally unique (the validator's suffix guarantee)
    val users = out.map(_.getAs[String]("username"))
    assert(users.distinct.length == users.length)
  }
}
