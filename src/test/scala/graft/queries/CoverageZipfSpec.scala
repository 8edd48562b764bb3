package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the vocabulary-budget curve and the Zipf fit: a
  * planted exact power law c(r) = 12/r recovers slope −1 and intercept
  * ln 12; coverage clamps k_eff to the vocabulary size and reaches
  * share 1 once everything is covered.
  */
class CoverageZipfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plantedDir(text: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // counts 12, 6, 4, 3 at ranks 1..4 — exactly c(r) = 12/r
  private val powerLaw: String =
    (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(3)("d")).mkString(" ")

  test("zipf_slope recovers slope -1 and intercept ln 12 on an exact " +
       "power law") {
    val r = TextQueries.zipfSlope(spark, plantedDir(powerLaw)).head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("slope") == -1.0)
    assert(r.getAs[Double]("intercept") ==
      math.rint(math.log(12.0) * 1e6) / 1e6)
  }

  test("coverage_curve: k_eff clamps to the 4-word vocab and every " +
       "budget reaches full coverage") {
    val rows = TextQueries.coverageCurve(spark, plantedDir(powerLaw))
      .select("k", "k_eff", "covered", "total", "share")
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(rows == List(
      (10L, 4L, 25L, 25L, 1.0),
      (100L, 4L, 25L, 25L, 1.0),
      (1000L, 4L, 25L, 25L, 1.0)))
  }
}
