package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden tests for the normalize pipeline, inputs/expectations lifted
  * from the reference semantics (`app.py:225-274`, SURVEY.md §5.2).
  */
class MoodleNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def roster(rows: (String, String, String, String)*) =
    rows.toDF("rut", "nombres", "apellidos", "email")

  test("username/password derivation with accents and two surnames") {
    val out = MoodleNormalize(
      roster(("12.345.678-9", "José Luis", "Pérez González", "jl@x.cl")),
      MoodleConfig(courseField = "C1", passwordYear = 2025)).head()
    assert(out.getAs[String]("username") == "joseperezgo")
    assert(out.getAs[String]("password") == "joseperezgo2025")
    assert(out.getAs[String]("firstname") == "José")
    assert(out.getAs[String]("lastname") == "Pérez González")
    assert(out.getAs[String]("email") == "jl@x.cl")
    assert(out.getAs[String]("profile_field_rut") == "12.345.678-9")
    assert(out.getAs[Int]("type1") == 1)
    assert(out.getAs[String]("course1") == "C1")
  }

  test("single surname yields no second-surname initials (app.py:208)") {
    val out = MoodleNormalize(roster(("1-1", "Ana", "Muñoz", "a@x.cl"))).head()
    assert(out.getAs[String]("username") == "anamunoz")
  }

  test("multi-address cell picks first @-token; no-@ falls back to whole text (app.py:190-198)") {
    val out = MoodleNormalize(roster(
      ("1-1", "Ana", "Soto", "primero@x.cl; segundo@y.cl"),
      ("2-2", "Luz", "Rojas", "sin correo aqui"))).collect()
    assert(out(0).getAs[String]("email") == "primero@x.cl")
    assert(out(1).getAs[String]("email") == "sin correo aqui")
  }

  test("rows with null rut or nombres are dropped (app.py:247)") {
    val out = MoodleNormalize(roster(
      (null, "Ana", "Soto", "a@x.cl"),
      ("1-1", null, "Soto", "b@x.cl"),
      ("2-2", "Luz", "Soto", "c@x.cl")))
    assert(out.count() == 1)
  }

  test("column order is the Moodle import contract (app.py:269-271)") {
    val cols = MoodleNormalize(roster(("1-1", "A", "B", "c@x.cl"))).columns.toSeq
    assert(cols == Seq("username", "password", "firstname", "lastname",
      "email", "profile_field_rut", "type1", "course1"))
  }

  test("password pattern expands all four placeholders") {
    val out = MoodleNormalize(
      roster(("7-7", "Ana", "Soto", "a@x.cl")),
      MoodleConfig(passwordPattern = "{rut}|{email}|{username}|{year}", passwordYear = 2030))
      .head()
    assert(out.getAs[String]("password") == "7-7|a@x.cl|anasoto|2030")
  }
}
