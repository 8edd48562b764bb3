package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Ground truth for per-dim z-score normalization: two mirrored vectors
  * give z = ±1 on every varying dim, and a constant dim yields NULL
  * (never ±Inf from the zero-variance division).
  */
class EmbNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embDir(rows: Seq[(Long, Seq[Float])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-embn").toString
    rows.toDF("vec_id", "embedding")
      .withColumn("label", org.apache.spark.sql.functions.lit(0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("mirrored pair normalizes to z = ±1; constant dim is NULL") {
    // dim 0: {2, 4} -> z = ∓1 ... mean 3, std 1; dim 1: constant 5
    val dir = embDir(Seq(
      (1L, Seq(2.0f, 5.0f)), (2L, Seq(4.0f, 5.0f))))
    val got = ScaleQueries.embNormalize(spark, dir)
      .select("vec_id", "pos", "z")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toList
    assert(got == List(
      (1L, 0L, Some(-1.0)), (1L, 1L, None),
      (2L, 0L, Some(1.0)), (2L, 1L, None)))
  }
}
