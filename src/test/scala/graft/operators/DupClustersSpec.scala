package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** smallCap=0 forces the distributed min-label loop; the default cap
    * routes graphs this size through the driver union-find fast path.
    * Every behavioral test runs BOTH paths — they must agree exactly.
    */
  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)], maxIter: Int = 25,
                 smallCap: Long = 4_000_000L) =
    DupClusters.connectedComponents(
      nodes.toDF("id"), edges.toDF("src", "dst"), maxIter, smallCap)
      .as[(Long, Long)].collect().toMap

  private val paths = Seq("union-find" -> 4_000_000L, "distributed" -> 0L)

  test("chain merges into one component labeled by its minimum id") {
    for ((label, cap) <- paths) {
      val got = cc(Seq(1L, 2L, 3L, 4L), Seq((2L, 1L), (2L, 3L), (3L, 4L)), smallCap = cap)
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L), label)
    }
  }

  test("disconnected components stay separate; isolated nodes are singletons") {
    for ((label, cap) <- paths) {
      val got = cc(Seq(1L, 2L, 3L, 4L, 9L), Seq((1L, 2L), (3L, 4L)), smallCap = cap)
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 9L -> 9L), label)
    }
  }

  test("long path needs multiple propagation rounds and still converges") {
    val n = 12L
    for ((label, cap) <- paths) {
      val got = cc(0L to n, (0L until n).map(i => (i, i + 1)), smallCap = cap)
      assert(got.values.toSet == Set(0L), label)
    }
  }

  test("empty node set returns an empty labeling, not a crash") {
    for ((label, cap) <- paths)
      assert(cc(Seq.empty[Long], Seq.empty[(Long, Long)], smallCap = cap).isEmpty, label)
  }

  test("insufficient iteration budget fails fast instead of mislabeling") {
    val n = 12L
    intercept[IllegalStateException] {
      cc(0L to n, (0L until n).map(i => (i, i + 1)), maxIter = 2, smallCap = 0L)
    }
  }

  private implicit def rangeToSeq(r: scala.collection.immutable.NumericRange[Long]): Seq[Long] = r.toSeq
}
