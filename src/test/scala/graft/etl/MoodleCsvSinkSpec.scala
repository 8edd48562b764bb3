package graft.etl

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MoodleCsvSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("writes one UTF-8 CSV file with header and contract column order") {
    val df = MoodleNormalize(
      Seq(("1-1", "José", "Pérez", "a@x.cl"), ("2-2", "Ana", "Muñoz", "b@x.cl"))
        .toDF("rut", "nombres", "apellidos", "email"))
    val out = Files.createTempDirectory("sink").resolve("moodle.csv").toString
    MoodleCsvSink.write(df.orderBy("profile_field_rut"), out)
    val lines = Files.readAllLines(Paths.get(out))
    assert(lines.get(0) ==
      "username,password,firstname,lastname,email,profile_field_rut,type1,course1")
    assert(lines.size() == 3)
    assert(lines.get(1).startsWith("joseperez,joseperez2025,José,Pérez,a@x.cl,1-1"))
  }
}
