package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registered custom expressions are callable from SQL") {
    Graft.register(spark)
    val row = spark.sql(
      "SELECT deaccent('Ángel Núñez') AS d, dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS p")
      .head()
    assert(row.getString(0) == "Angel Nunez")
    assert(row.getDouble(1) == 11.0)
  }

  test("wrong arity raises a clean WRONG_NUM_ARGS analysis error, not an index crash") {
    Graft.register(spark)
    for (bad <- Seq("SELECT deaccent('a', 'b')", "SELECT dot_product(array(1.0D))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad).head())
      assert(e.getCondition != null && e.getCondition.startsWith("WRONG_NUM_ARGS"), bad)
    }
  }

  test("extensions class injects without error at session build time") {
    // SparkSessionExtensions is a plain public class; applying the
    // injector must register both functions.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
