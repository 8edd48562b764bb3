package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the clustering-agreement report: orthogonal planted
  * clusters with matching labels give purity = ARI = 1; a label-blind
  * corpus (every vector the same label) gives ARI exactly 0 while
  * purity stays 1 — the chance-correction doing its job.
  */
class ClusterPuritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 16 orthogonal directions (the k-means seeds are the first 16
    * vec_ids, so each direction becomes its own centroid), `copies`
    * vectors per direction, label given by `labelOf`.
    */
  private def embDir(copies: Int, labelOf: Int => Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-purity").toString
    val rows = for (c <- 0 until copies; d <- 0 until 16) yield {
      val v = Array.fill(64)(0.0f); v(d) = 1.0f
      ((c * 16 + d).toLong, v.toSeq, labelOf(d))
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("matching labels: purity 1, ARI 1") {
    val r = ScaleQueries.clusterPurity(spark, embDir(3, d => d)).head()
    assert(r.getAs[Long]("n_vecs") == 48L)
    assert(r.getAs[Long]("n_cells") == 16L)
    assert(r.getAs[Double]("purity") == 1.0)
    assert(r.getAs[Double]("ari") == 1.0)
  }

  test("label-blind corpus: purity still 1 per cell, ARI exactly 0") {
    val r = ScaleQueries.clusterPurity(spark, embDir(3, _ => 0)).head()
    assert(r.getAs[Double]("purity") == 1.0)
    assert(r.getAs[Double]("ari") == 0.0)
  }
}
