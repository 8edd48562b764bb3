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

  test("ngram_distinct from SQL: repeated trigram collapses") {
    Graft.register(spark)
    val got = spark.sql(
      "SELECT ngram_distinct(array('a','b','c','a','b','c'), 3) AS d").head().getLong(0)
    assert(got == 3L)
  }

  test("wrong arity raises a clean WRONG_NUM_ARGS analysis error, not an index crash") {
    Graft.register(spark)
    for (bad <- Seq("SELECT deaccent('a', 'b')", "SELECT dot_product(array(1.0D))",
        "SELECT ngram_hash(array('a'), 0)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(bad).head())
      assert(e.getCondition != null && e.getCondition.startsWith("WRONG_NUM_ARGS"), bad)
    }
  }

  test("ngram_hash from SQL equals the Column-API kernel; non-literal n rejected") {
    Graft.register(spark)
    val viaSql = spark.sql(
      "SELECT ngram_hash(array('a','b','c'), 0, 2) AS h").head().getLong(0)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaCol = Seq(Tuple1(Seq("a", "b", "c"))).toDF("t")
      .select(graft.functions.NgramKernels.ngramHashCol(col("t"), lit(0), 2).as("h"))
      .head().getLong(0)
    assert(viaSql == viaCol)
    // the builder's AnalysisException surfaces wrapped in a SparkException
    val e = intercept[Exception](
      spark.sql("SELECT ngram_hash(array('a'), 0, cast(rand()*2 AS INT))").head())
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }

  test("deflate pair is callable from SQL: ratio matches len/octets, " +
       "repetition scores below noise") {
    Graft.register(spark)
    val row = spark.sql(
      "SELECT deflate_ratio(repeat('spam ', 200)) AS rep, " +
      "deflate_ratio('the quick brown fox') AS nat, " +
      "deflate_len(repeat('spam ', 200)) AS dl").head()
    assert(row.getDouble(0) < 0.05)
    assert(row.getDouble(0) < row.getDouble(1))
    assert(math.abs(row.getDouble(0) - row.getLong(2).toDouble / 1000) < 1e-9)
  }

  test("weighted_mean UDAF is callable from SQL after register") {
    Graft.register(spark)
    val got = spark.sql(
      "SELECT weighted_mean(v, w) AS wm FROM VALUES (1.0D, 1.0D), (3.0D, 3.0D) AS t(v, w)")
      .head().getDouble(0)
    assert(got == 2.5) // (1*1 + 3*3) / (1 + 3)
  }

  test("extensions class injects without error at session build time") {
    // SparkSessionExtensions is a plain public class; applying the
    // injector must register both functions.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
