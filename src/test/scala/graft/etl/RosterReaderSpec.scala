package graft.etl

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** S2 — positional slice + header promotion (`app.py:236-238`). */
class RosterReaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeCsv(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("roster")
    val f   = dir.resolve("roster.csv")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("row 3 becomes the header, rows 0-2 are discarded, renames apply") {
    val path = writeCsv(Seq(
      "Listado oficial,,,",
      "Generado: 2025,,,",
      ",,,",
      "Rut (con punto y con guión),Nombres ,Apellidos,Correo electrónico",
      "1-9,Ana,Soto,a@x.cl",
      "2-7,Luis,Rojas,l@x.cl"))
    val df = RosterReader.read(spark, path)
    assert(df.columns.toSeq == Seq("rut", "nombres", "apellidos", "email"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("1-9", "Ana"), ("2-7", "Luis")))
  }

  test("extra columns are carried through; blank headers get positional names") {
    val path = writeCsv(Seq(
      "x,x,x,x,x",
      "x,x,x,x,x",
      ",,,,",
      "Rut (con punto y con guión),Nombres ,Apellidos,Correo electrónico,",
      "1-9,Ana,Soto,a@x.cl,extra"))
    val df = RosterReader.read(spark, path)
    assert(df.columns.length == 5)
    assert(df.columns.take(4).toSeq == Seq("rut", "nombres", "apellidos", "email"))
  }

  test("file order is preserved as row order") {
    val data = (1 to 200).map(i => s"$i-0,N$i,S$i,n$i@x.cl")
    val path = writeCsv(Seq("p", "p", "p",
      "Rut (con punto y con guión),Nombres ,Apellidos,Correo electrónico") ++ data)
    val df = RosterReader.read(spark, path)
    // narrow single-field preamble must NOT truncate the schema
    assert(df.columns.toSeq == Seq("rut", "nombres", "apellidos", "email"))
    val ruts = df.collect().map(_.getString(0))
    assert(ruts.toSeq == (1 to 200).map(i => s"$i-0"))
  }

  test("quoted embedded newline in the preamble does not shift the header index") {
    // the quoted field spans two PHYSICAL lines; both passes must index
    // physical lines (multiLine=false) or the header promotion desyncs
    val path = writeCsv(Seq(
      "\"Listado", "oficial\",,,",
      ",,,",
      "Rut (con punto y con guión),Nombres ,Apellidos,Correo electrónico",
      "1-9,Ana,Soto,a@x.cl"))
    val df = RosterReader.read(spark, path)
    assert(df.columns.toSeq == Seq("rut", "nombres", "apellidos", "email"))
    assert(df.collect().map(_.getString(1)).toSeq == Seq("Ana"))
  }

  test("missing header row fails fast") {
    val path = writeCsv(Seq("only,one,row"))
    intercept[IllegalArgumentException](RosterReader.read(spark, path))
  }
}
