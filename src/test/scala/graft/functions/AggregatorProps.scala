package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import scala.collection.mutable

/** Property-based coverage for the mergeable aggregation kernels: any
  * chunking of the input, folded per-chunk and merged in any tree
  * order, must satisfy the operator's contract — the algebraic fact
  * that makes map-side combine + arbitrary shuffle merge order safe.
  */
object AggregatorProps extends Properties("Aggregators.merge") {

  // random chunking of a list (models arbitrary partitioning)
  private def chunked[A](xs: List[A]): Gen[List[List[A]]] =
    if (xs.isEmpty) Gen.const(Nil)
    else Gen.listOfN(xs.length, Gen.prob(0.15)).map { cuts =>
      val out = mutable.ListBuffer(mutable.ListBuffer.empty[A])
      xs.zip(cuts).foreach { case (x, cut) =>
        if (cut && out.last.nonEmpty) out += mutable.ListBuffer.empty[A]
        out.last += x
      }
      out.map(_.toList).toList
    }

  private val scoredRows: Gen[List[Scored]] =
    Gen.listOf(for {
      s <- Gen.chooseNum(0, 30)
      id <- Gen.chooseNum(0L, 200L)
    } yield Scored(s.toDouble, id))

  property("TopKAgg == sorted-take-k under any partitioning/merge order") =
    Prop.forAll(scoredRows.flatMap(xs => chunked(xs).map(xs -> _))) {
      case (xs, chunks) =>
        val agg = new TopKAgg(5)
        val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = partials.foldLeft(agg.zero)(agg.merge)
        val got = agg.finish(merged)
        val expect = xs.map(s => (-s.score, s.id)).sorted.take(5)
          .map { case (negS, id) => (-negS, id) }
        got.scores.zip(got.ids) == expect &&
          got.scores.lengthIs <= 5
    }

  private val skewedKeys: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      4 -> Gen.oneOf((0 until 40).map(i => s"c$i"))))

  property("HeavyHittersAgg: frequent keys survive, counts are bounded underestimates") =
    Prop.forAll(skewedKeys.flatMap(xs => chunked(xs).map(xs -> _))) {
      case (xs, chunks) =>
        val c = 8
        val agg = new HeavyHittersAgg(c)
        val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = partials.foldLeft(agg.zero)(agg.merge)
        val got = agg.finish(merged)
        val n = xs.length
        val err = n / (c + 1)
        val truth = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
        val estimates = got.keys.zip(got.counts).toMap
        got.keys.lengthIs <= c &&
          truth.forall { case (k, cnt) => cnt <= err || estimates.contains(k) } &&
          estimates.forall { case (k, est) =>
            est <= truth(k) && truth(k) - est <= err }
    }

  private val hashLists: Gen[List[Long]] =
    Gen.listOf(Gen.frequency(
      3 -> Gen.chooseNum(Long.MinValue, Long.MaxValue),
      1 -> Gen.oneOf(-7L, 0L, 42L, Long.MinValue, Long.MaxValue)))

  property("KmvAgg == bottom-k of the distinct set under any partitioning/merge order") =
    Prop.forAll(hashLists.flatMap(xs => chunked(xs).map(xs -> _))) {
      case (xs, chunks) =>
        val k = 8
        val agg = new KmvAgg(k)
        val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = partials.foldLeft(agg.zero)(agg.merge)
        val got = agg.finish(merged)
        val distinctFlipped = xs.map(_ ^ Long.MinValue).distinct.sorted
        got.vals == distinctFlipped.take(k) &&
          got.full == (distinctFlipped.length >= k)
    }

  // any deterministic per-row index derivation works for the contract;
  // a deliberately weak mix still satisfies both properties below
  private val CmsD = 3
  private val CmsW = 16
  private def cmsIdx(key: Long): Seq[Int] =
    Seq.tabulate(CmsD)(i =>
      Math.floorMod((key * 0x9E3779B97F4A7C15L + i * 0x5851F42D4C957F2DL) >>> 7, CmsW).toInt)

  private val cmsKeys: Gen[List[Long]] =
    Gen.listOf(Gen.frequency(
      4 -> Gen.chooseNum(0L, 12L),     // dense collisions at width 16
      1 -> Gen.chooseNum(Long.MinValue, Long.MaxValue)))

  property("CmsAgg: partition-invariant counters; point estimate never undercounts") =
    Prop.forAll(cmsKeys.flatMap(xs => chunked(xs).map(xs -> _))) {
      case (xs, chunks) =>
        val agg = new CmsAgg(CmsD, CmsW)
        val partials = chunks.map(_.foldLeft(agg.zero)((b, k) => agg.reduce(b, cmsIdx(k))))
        val merged = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
        val whole = agg.finish(xs.foldLeft(agg.zero)((b, k) => agg.reduce(b, cmsIdx(k))))
        def est(sk: Seq[Long], key: Long): Long =
          cmsIdx(key).zipWithIndex.map { case (idx, i) => sk(i * CmsW + idx) }.min
        val truth = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
        merged == whole &&
          truth.forall { case (k, cnt) => est(merged, k) >= cnt } &&
          merged.sum == xs.length.toLong * CmsD
    }
}
