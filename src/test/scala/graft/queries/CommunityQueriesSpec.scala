package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the community/mixture operators: a driver-side LPA
  * replay on a planted clique graph, the mixture-weight simplex and
  * small-source-upsample laws, rank preservation under quantile
  * normalization, and the round-robin property of the curriculum
  * interleave.
  */
class CommunityQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bfs_hops: path graph labels hops 0..4 from the min node; nodes " +
       "beyond BfsRounds hops are absent") {
    // path 1-2-3-4-5-6-7 → seed 1, d(k)=k-1; 6 and 7 exceed 4 hops
    val dir = java.nio.file.Files.createTempDirectory("graft-bfs").toString
    (1L to 6L).map(i => (i * 10, i, i + 1))
      .flatMap { case (o, a, b) => Seq((o, a), (o, b)) }
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_quantity", lit(50.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = CommunityQueries.bfsHops(spark, dir)
      .as[(Long, Long)].collect().toList
    assert(got == List((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)))
  }

  test("modularity: two disjoint triangles score Q_c = 0.25 each " +
       "(total Q = 0.5, the textbook two-community value)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mod").toString
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 4L), (20L, 5L), (20L, 6L))
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_quantity", lit(50.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // LPA on a triangle converges to the min node's label
    val got = CommunityQueries.modularity(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(got == List((1L, 3L, 3L, 6L, 0.25), (4L, 3L, 3L, 6L, 0.25)))
  }

  test("assortativity: a star is perfectly disassortative (r = −1); " +
       "hub degree and edge count exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-assort").toString
    // three orders, each pairing hub part 100 with one leaf
    Seq((10L, 100L), (10L, 1L), (20L, 100L), (20L, 2L), (30L, 100L), (30L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_quantity", lit(50.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = CommunityQueries.assortativity(spark, dir)
      .as[(Long, Double)].collect().toList
    assert(got == List((6L, -1.0)))
  }

  test("label_prop matches a driver-side synchronous LPA replay on planted " +
       "cliques, and each clique converges to one label") {
    // orders as cliques: {1,2,3}, {4,5,6}, bridged by order {3,4}
    val dir = java.nio.file.Files.createTempDirectory("graft-lpa").toString
    val lines = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 4L), (20L, 5L), (20L, 6L), (30L, 3L), (30L, 4L))
    lines.toDF("l_orderkey", "l_partkey")
      .withColumn("l_quantity", lit(50.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = CommunityQueries.labelProp(spark, dir)
      .as[(Long, Long)].collect().toMap

    // driver replay of the exact operator semantics
    val edges = lines.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    var lab = edges.map(_._1).map(n => n -> n).toMap
    for (_ <- 1 to CommunityQueries.LpIters) {
      lab = edges.groupBy(_._1).map { case (v, es) =>
        val cnt = es.toSeq.map(e => lab(e._2))
          .groupBy(identity).map { case (l, o) => (l, o.size) }
        v -> cnt.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    assert(got == lab)
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(4L), got(5L), got(6L)).size == 1)
  }

  private val sf = "/root/testdata/sf0.001"

  test("mix_weights: weights form a simplex and α<1 upsamples small sources " +
       "(weight share > count share below the mean, < above)") {
    val out = CommunityQueries.mixWeights(spark, sf)
      .select("source", "n_docs", "weight").as[(String, Long, Double)].collect()
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-3)
    val total = out.map(_._2).sum.toDouble
    val smallest = out.minBy(_._2); val largest = out.maxBy(_._2)
    if (smallest._2 < largest._2) {
      assert(smallest._3 > smallest._2 / total)
      assert(largest._3 < largest._2 / total)
    }
  }

  test("quantile_norm: values come from the global distribution, order is " +
       "preserved within source, and extremes map to global extremes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val globalVals = docs.select("n_chars").as[Long].collect().sorted
    val out = CommunityQueries.quantileNorm(spark, sf)
      .select("source", "n_chars", "norm").as[(String, Long, Long)].collect()
    assert(out.length == globalVals.length)
    assert(out.forall(r => globalVals.contains(r._3)))
    out.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(r => (r._2, r._3))
      assert(sorted.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("curriculum_order: per-bucket ranks are 1..m and the rank-1 wave " +
       "holds exactly one doc from every non-empty bucket") {
    val out = CommunityQueries.curriculumOrder(spark, sf)
      .select("doc_id", "bucket", "rk").as[(Long, Long, Long)].collect()
    out.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length.toLong))
    }
    val buckets = out.map(_._2).distinct
    assert(out.filter(_._3 == 1L).map(_._2).sorted.toSeq == buckets.sorted.toSeq)
  }
}
