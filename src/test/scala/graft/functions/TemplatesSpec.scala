package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TemplatesSpec extends AnyFunSuite {

  test("dollar templates: both $var and ${var} forms") {
    val t = Template.dollar("Hola $nombre, tu curso: ${curso}!")
    assert(t.varNames == Set("nombre", "curso"))
    assert(t.render(Map("nombre" -> "Ana", "curso" -> "X")) == "Hola Ana, tu curso: X!")
  }

  test("braces templates mirror Python str.format for the password pattern") {
    val t = Template.braces("{username}{year}-{rut}")
    assert(t.render(Map("username" -> "jperez", "year" -> "2025", "rut" -> "1-1"))
      == "jperez2025-1-1")
  }

  test("column render equals scala render") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = Template.dollar("u=$u p=$p")
    val got = Seq(("a", "b")).toDF("u", "p")
      .select(t.column(Map("u" -> col("u"), "p" -> col("p"))).as("r"))
      .head().getString(0)
    assert(got == t.render(Map("u" -> "a", "p" -> "b")))
  }

  test("sql literal escaping handles quotes and newlines") {
    assert(Template.sqlStringLiteral("it's") == "'it''s'")
    assert(Template.sqlStringLiteral("a\nb") == "('a' || chr(10) || 'b')")
    assert(Template.sqlStringLiteral("") == "''")
  }

  test("sql render of a template with embedded newline parses in Spark SQL") {
    val spark = TestSpark.spark
    val t   = Template.dollar("line1\nHola $n")
    val sql = t.sql(Map("n" -> "'X'"))
    val got = spark.sql(s"SELECT $sql AS r").head().getString(0)
    assert(got == "line1\nHola X")
  }

  test("missing variable binding fails fast") {
    val t = Template.dollar("$a $b")
    intercept[IllegalArgumentException](t.render(Map("a" -> "1")))
  }
}
