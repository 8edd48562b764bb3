package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for per-doc corpus novelty: first occurrence owns the
  * gram, an exact copy scores 0, partial overlap scores its new-gram
  * share.
  */
class NoveltyRateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plantedDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-novel").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("first doc is fully novel, its copy scores 0, partial overlap " +
       "scores the new-gram share") {
    val dir = plantedDir(Seq(
      (1L, "w1 w2 w3 w4"),      // grams w1w2w3, w2w3w4 — both first here
      (2L, "w1 w2 w3 w4"),      // exact copy — nothing novel
      (3L, "w1 w2 w3 x y")))    // w1w2w3 seen; w2w3x, w3xy new → 2/3
    val got = ScaleQueries.noveltyRate(spark, dir)
      .select("doc_id", "n_grams", "novel")
      .as[(Long, Long, Double)].collect().toList
    assert(got == List(
      (1L, 2L, 1.0), (2L, 2L, 0.0), (3L, 3L, 0.666667)))
  }
}
