package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Dialect detection + normalization (`load_users_from_csv`,
  * `app.py:277-315`).
  */
class MailSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dialect precedence: old beats moodle (app.py:286)") {
    assert(MailSource.detect(Seq("email", "usuario", "username", "password"))
      == MailSource.OldDialect)
    assert(MailSource.detect(Seq("email", "username", "password"))
      == MailSource.MoodleDialect)
    assert(MailSource.detect(Seq("email", "nombre")) == MailSource.FallbackDialect)
  }

  test("old dialect trims all four fields") {
    val out = MailSource.normalize(
      Seq((" a@x.cl ", " Ana ", " u1 ", " p1 ")).toDF("email", "nombre", "usuario", "contrasena"))
      .as[MailUser].head()
    assert(out == MailUser("a@x.cl", "Ana", "u1", "p1"))
  }

  test("moodle dialect builds nombre from names, falling back to title-cased local part (app.py:296-299)") {
    val out = MailSource.normalize(
      Seq(
        ("a@x.cl", "Ana", "Soto", "u1", "p1"),
        ("bob.go@x.cl", "", "", "u2", "p2"))
        .toDF("email", "firstname", "lastname", "username", "password"))
      .as[MailUser].collect()
    assert(out(0).nombre == "Ana Soto")
    assert(out(1).nombre == "Bob.go")
  }

  test("fallback dialect derives usuario from username then local part (app.py:303-306)") {
    val out = MailSource.normalize(
      Seq(("ana@x.cl", ""), ("luz@x.cl", "u9")).toDF("email", "username"))
      .as[MailUser].collect()
    assert(out(0) == MailUser("ana@x.cl", "Ana", "ana", ""))
    assert(out(1) == MailUser("luz@x.cl", "Luz", "u9", ""))
  }

  test("rows with blank email are dropped (app.py:308)") {
    val out = MailSource.normalize(
      Seq(("", "x", "y", "z"), ("  ", "x", "y", "z"), ("ok@x.cl", "n", "u", "c"))
        .toDF("email", "nombre", "usuario", "contrasena"))
    assert(out.count() == 1)
  }

  test("source with no email column yields an empty queue, not an error") {
    val out = MailSource.normalize(
      Seq(("x", "y")).toDF("nombre", "usuario"))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("email", "nombre", "usuario", "contrasena"))
  }

  test("normalized output never contains a NULL field (dialect coalesce totality)") {
    val out = MailSource.normalize(
      Seq(("a@x.cl", ""), ("b@x.cl", "u2")).toDF("email", "username"))
      .as[MailUser].collect()
    assert(out.forall(u =>
      u.email != null && u.nombre != null && u.usuario != null && u.contrasena != null))
  }

  test("uppercase headers are normalized, not dropped (documented divergence, SURVEY §1.3)") {
    val out = MailSource.normalize(
      Seq(("a@x.cl", "Ana", "u1", "p1")).toDF("Email", "Nombre", "Usuario", "Contrasena"))
      .as[MailUser].collect()
    assert(out.length == 1 && out(0).usuario == "u1")
  }
}
