package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Golden behavior for F2-F9, pairs lifted from the reference
  * (SURVEY.md §2.3, §5.2).
  */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval1(in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(in).toDF("s").select(f(col("s")).as("r")).head().getString(0)

  test("normalizeUsername strips space dot comma quotes then accents (app.py:176-187)") {
    assert(eval1("""José O'Neil, "el" D.""", TextFunctions.normalizeUsername)
      == "joseoneileld")
  }

  test("selectSingleEmail picks first @-token across separators (app.py:190-198)") {
    assert(eval1("a@b.c; d@e.f", TextFunctions.selectSingleEmail) == "a@b.c")
    assert(eval1("x y\nz@w.v", TextFunctions.selectSingleEmail) == "z@w.v")
    assert(eval1("no arroba aqui", TextFunctions.selectSingleEmail) == "no arroba aqui")
    assert(eval1("  solo@uno.cl  ", TextFunctions.selectSingleEmail) == "solo@uno.cl")
  }

  test("buildUsername: tokens, initials, missing pieces (app.py:201-211)") {
    def u(nombres: String, apellidos: String): String =
      Seq((nombres, apellidos)).toDF("n", "a")
        .select(TextFunctions.buildUsername(col("n"), col("a")).as("r"))
        .head().getString(0)
    assert(u("José Luis", "Pérez González") == "joseperezgo")
    assert(u("Ana", "Muñoz") == "anamunoz")
    assert(u("  Luz María ", " Núñez  Ibáñez ") == "luznunezib")
  }

  test("emailLocalPart and titleCase compose the display-name fallback (app.py:299)") {
    assert(eval1("bob.go@x.cl", c => initcap(TextFunctions.emailLocalPart(c))) == "Bob.go")
  }

  test("nullIfEmpty matches Python truthiness on raw values (app.py:304)") {
    val out = Seq(("", "fb"), (" ", "fb"), ("v", "fb")).toDF("a", "b")
      .select(coalesce(TextFunctions.nullIfEmpty(col("a")), col("b")).as("r"))
      .as[String].collect().toSeq
    assert(out == Seq("fb", " ", "v"))
  }
}
