package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Tables

class SizingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("partition count tracks the stats estimate at the byte target") {
    val li = Tables.read(spark, dir, "lineitem")
    val bytes = Sizing.estimatedBytes(li)
    assert(bytes > 0)
    // a target equal to the whole estimate → 1 partition; a target of
    // 1/8th → 8-ish (ceiling division, exact by construction)
    assert(Sizing.partitionsFor(li, targetBytes = bytes.toLong.max(1L)) == 1)
    val eighth = (bytes / 8).toLong.max(1L)
    val got = Sizing.partitionsFor(li, targetBytes = eighth)
    assert(got >= 8 && got <= 9, s"got $got")
  }

  test("clamps to [1, maxPartitions] at the extremes") {
    val li = Tables.read(spark, dir, "lineitem")
    assert(Sizing.partitionsFor(li, targetBytes = Long.MaxValue) == 1)
    assert(Sizing.partitionsFor(li, targetBytes = 1, maxPartitions = 64) == 64)
  }

  test("sizedRepartition applies the derived count to a keyed repartition") {
    val li = Tables.read(spark, dir, "lineitem")
    val target = (Sizing.estimatedBytes(li) / 4).toLong.max(1L)
    val parts = Sizing.sizedRepartition(li, Seq("l_orderkey"), target)
      .rdd.getNumPartitions
    assert(parts == Sizing.partitionsFor(li, target), s"got $parts")
  }
}
