package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)], maxIter: Int = 25) =
    DupClusters.connectedComponents(
      nodes.toDF("id"), edges.toDF("src", "dst"), maxIter)
      .as[(Long, Long)].collect().toMap

  test("chain merges into one component labeled by its minimum id") {
    val got = cc(Seq(1L, 2L, 3L, 4L), Seq((2L, 1L), (2L, 3L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disconnected components stay separate; isolated nodes are singletons") {
    val got = cc(Seq(1L, 2L, 3L, 4L, 9L), Seq((1L, 2L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 9L -> 9L))
  }

  test("long path needs multiple propagation rounds and still converges") {
    val n = 12L
    val got = cc(0L to n, (0L until n).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(0L))
  }

  test("empty node set returns an empty labeling, not a crash") {
    assert(cc(Seq.empty[Long], Seq.empty[(Long, Long)]).isEmpty)
  }

  test("insufficient iteration budget fails fast instead of mislabeling") {
    val n = 12L
    intercept[IllegalStateException] {
      cc(0L to n, (0L until n).map(i => (i, i + 1)), maxIter = 2)
    }
  }

  private implicit def rangeToSeq(r: scala.collection.immutable.NumericRange[Long]): Seq[Long] = r.toSeq
}
