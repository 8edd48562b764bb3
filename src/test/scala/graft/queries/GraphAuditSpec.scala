package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the clustering-coefficient and bipartite-HITS
  * audits: a planted triangle is perfectly transitive (C = 1), a star
  * has no triangles (C = 0), and the unnormalized HITS scores are
  * exact path counts a hand calculation pins.
  */
class GraphAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lineitemDir(rows: Seq[(Long, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-gaudit").toString
    rows.toDF("l_orderkey", "l_partkey")
      .withColumn("l_quantity", lit(50.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("clustering_coeff: a triangle is perfectly transitive (C = 1)") {
    val dir = lineitemDir(Seq((10L, 1L), (10L, 2L), (10L, 3L)))
    val got = InsightQueries.clusteringCoeff(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    // 3 nodes, 3 edges, 1 triangle, 3 centered wedges, C = 3·1/3 = 1
    assert(got == List((3L, 3L, 1L, 3L, 1.0)))
  }

  test("clustering_coeff: a star closes no triangles (C = 0)") {
    val dir = lineitemDir(Seq(
      (10L, 100L), (10L, 1L), (20L, 100L), (20L, 2L), (30L, 100L), (30L, 3L)))
    val got = InsightQueries.clusteringCoeff(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    // hub degree 3 → C(3,2)=3 centered wedges, 0 triangles
    assert(got == List((4L, 3L, 0L, 3L, 0.0)))
  }

  test("hits_rank: unnormalized scores are exact path counts on a " +
       "hand-computed bipartite graph") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hits").toString
    // c1 buys {p1, p2}; c2 buys {p2}
    Seq((1L, 11L), (2L, 22L))
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 101L), (1L, 102L), (2L, 102L))
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_quantity", lit(50.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = InsightQueries.hitsRank(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toList
    // a1: p101=1, p102=2 ; h1: c11=3, c22=2 ; a2: p101=3, p102=5
    assert(got == List((1L, 102L, 2L, 5L), (2L, 101L, 1L, 3L)))
  }
}
