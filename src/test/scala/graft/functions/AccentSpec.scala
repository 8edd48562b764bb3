package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** F1 semantics (`app.py:169-173`): NFKD + drop combining marks. */
class AccentSpec extends AnyFunSuite {

  test("golden pairs match the reference's unicodedata behavior") {
    val cases = Seq(
      "José"        -> "Jose",
      "Pérez"       -> "Perez",
      "Muñoz"       -> "Munoz",
      "Núñez Ibáñez"-> "Nunez Ibanez",
      "Ángel"       -> "Angel",
      "über"        -> "uber",
      "ASCII stays" -> "ASCII stays",
      ""            -> "")
    cases.foreach { case (in, want) => assert(Accent.strip(in) == want, s"for '$in'") }
  }

  test("NFKD compatibility forms decompose (ligature, full-width)") {
    assert(Accent.strip("ﬁn") == "fin")      // U+FB01 ligature fi
    assert(Accent.strip("Ｘ") == "X")        // full-width X
  }

  test("idempotent and ASCII-fixpoint on random strings") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = rnd.nextString(20)
      val once = Accent.strip(s)
      assert(Accent.strip(once) == once)
      val ascii = rnd.alphanumeric.take(20).mkString
      assert(Accent.strip(ascii) == ascii)
    }
  }

  test("DeAccent expression evaluates via codegen inside a plan") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = Seq("José Pérez", "ñandú", null)
      .toDF("s")
      .select(Accent.deaccent(col("s")).as("d"))
      .collect()
      .map(r => Option(r.getString(0)).orNull)
    assert(out.toSeq == Seq("Jose Perez", "nandu", null))
  }

  test("expression participates in whole-stage codegen (no UDF fence)") {
    val spark = TestSpark.spark
    // A range scan can't be constant-folded into a LocalTableScan, so the
    // generated-code path is actually exercised.
    val df = spark.range(2)
      .select(Accent.deaccent(concat(lit("café"), col("id").cast("string"))).as("d"))
      .filter(col("d").startsWith("cafe"))
    assert(df.count() == 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"), plan)
  }
}
