package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MergeUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def merge(base: Seq[(Long, String, Double)],
                    changes: Seq[(Long, String, Double)]) =
    Relational.mergeUpsert(
      base.toDF("k", "status", "amt"), changes.toDF("k", "status", "amt"), Seq("k"))
      .as[(Long, String, Double)].collect().toSet

  test("matched keys take the change row wholesale") {
    val got = merge(
      base = Seq((1L, "old", 10.0), (2L, "old", 20.0)),
      changes = Seq((2L, "new", 99.0)))
    assert(got == Set((1L, "old", 10.0), (2L, "new", 99.0)))
  }

  test("unmatched change keys insert") {
    val got = merge(
      base = Seq((1L, "old", 10.0)),
      changes = Seq((5L, "ins", 50.0)))
    assert(got == Set((1L, "old", 10.0), (5L, "ins", 50.0)))
  }

  test("empty changes is the identity") {
    val got = merge(base = Seq((1L, "old", 10.0)), changes = Seq.empty)
    assert(got == Set((1L, "old", 10.0)))
  }

  test("mismatched schemas fail fast") {
    intercept[IllegalArgumentException] {
      Relational.mergeUpsert(
        Seq((1L, "a")).toDF("k", "s"), Seq((1L, 2.0)).toDF("k", "x"), Seq("k"))
    }
  }

  test("NULL change payload columns override base (row-wise MERGE semantics)") {
    // a change row with a NULL payload column must NOT resurrect the base
    // value for that column — the change row replaces the base row
    // wholesale, exactly like MERGE INTO ... UPDATE SET *.
    val base = Seq((1L, Some("old"), Some(10.0))).toDF("k", "status", "amt")
    val changes = Seq((1L, None: Option[String], Some(99.0))).toDF("k", "status", "amt")
    val got = Relational.mergeUpsert(base, changes, Seq("k"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(got == Set((1L, None, Some(99.0))))
  }

  test("base rows missing from changes keep their NULLs; inserts keep theirs") {
    val base = Seq((1L, None: Option[String], Some(10.0))).toDF("k", "status", "amt")
    val changes = Seq((2L, Some("ins"), None: Option[Double])).toDF("k", "status", "amt")
    val got = Relational.mergeUpsert(base, changes, Seq("k"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(got == Set((1L, None, Some(10.0)), (2L, Some("ins"), None)))
  }
}
