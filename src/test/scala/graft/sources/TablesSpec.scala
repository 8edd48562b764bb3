package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nanos flag: genuinely-unset session gets the engine convention") {
    val s = spark.newSession()
    s.conf.unset(Tables.NanosFlag)
    Tables.ensureNanosAsLong(s)
    assert(s.conf.get(Tables.NanosFlag) == "true")
  }

  test("nanos flag: a caller's explicit false is never flipped") {
    val s = spark.newSession()
    s.conf.set(Tables.NanosFlag, "false")
    Tables.ensureNanosAsLong(s)
    assert(s.conf.get(Tables.NanosFlag) == "false")
  }
}
