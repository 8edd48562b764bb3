package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.Accent

class CollapseDeAccentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rule collapses nested deaccent to a single application") {
    val df = spark.range(2)
      .select(Accent.deaccent(Accent.deaccent(
        concat(lit("café"), col("id").cast("string")))).as("d"))
    val before = df.queryExecution.analyzed
    val after  = CollapseDeAccent(spark)(before)

    def countDeAccent(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      var n = 0
      plan.transformAllExpressions {
        case e: graft.functions.DeAccent => n += 1; e
      }
      n
    }
    assert(countDeAccent(before) == 2)
    assert(countDeAccent(after) == 1)
  }

  test("rewrite preserves results") {
    import spark.implicits._
    val nested = Seq("Ángel", "plain").toDF("s")
      .select(Accent.deaccent(Accent.deaccent(col("s"))).as("d"))
      .as[String].collect().toSeq
    val single = Seq("Ángel", "plain").toDF("s")
      .select(Accent.deaccent(col("s")).as("d"))
      .as[String].collect().toSeq
    assert(nested == single)
  }

  test("triple nesting collapses fully (rule is bottom-up fixpoint-safe)") {
    val df = spark.range(1).select(
      Accent.deaccent(Accent.deaccent(Accent.deaccent(lit("ñ")))).as("d"))
    val once  = CollapseDeAccent(spark)(df.queryExecution.analyzed)
    val twice = CollapseDeAccent(spark)(once)
    var n = 0
    twice.transformAllExpressions { case e: graft.functions.DeAccent => n += 1; e }
    assert(n == 1)
  }
}
