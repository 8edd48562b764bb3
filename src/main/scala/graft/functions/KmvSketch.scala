package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Finished KMV (k-minimum-values / bottom-k theta) sketch.
  *
  * `vals` are the k smallest DISTINCT sign-flipped hashes seen
  * (ascending = unsigned ascending of the raw hash); `full` records
  * whether the cap was reached. When `full`, the last retained value is
  * the sketch's theta: every retained value is a uniform sample of the
  * hash space below it, which is what makes INTERSECTION (and any other
  * set expression) estimable across sketches — the operation HLL union
  * cannot provide. Estimate |A ∩ B| = |{v ∈ K_A ∩ K_B : v < θ}| / frac(θ)
  * with θ = min(θ_A, θ_B).
  */
final case class KmvSketch(vals: Seq[Long], full: Boolean)

object KmvSketch {
  /** Fraction of the 64-bit hash space at or below flipped value `y`
    * (y already sign-flipped so its signed order is unsigned hash order).
    */
  def frac(y: Long): Double =
    (y.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
}

/** Bottom-k distinct sketch as a mergeable typed Aggregator.
  *
  * The buffer is a bounded `java.util.TreeSet` of sign-flipped hashes
  * (TreeSet dedupes re-inserts, so duplicates never occupy slots — the
  * DISTINCT semantics KMV requires). reduce() is O(log k) with an O(1)
  * reject test against the current max; merge() is set-union-then-trim,
  * which is exactly the mergeable-summaries property: sketch(A ∪ B) =
  * trim_k(sketch(A) ∪ sketch(B)) — proven as an equality in
  * KmvSketchSpec, so map-side partials combine freely and the shuffle
  * carries at most k longs per (group, partition) no matter how many
  * rows or how skewed the group.
  *
  * Kryo encoder keeps the TreeSet as a live JVM object inside
  * ObjectHashAggregate between rows (the HeavyHittersAgg pattern).
  */
final class KmvAgg(k: Int) extends Aggregator[Long, java.util.TreeSet[java.lang.Long], KmvSketch] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet[java.lang.Long]()

  override def reduce(b: java.util.TreeSet[java.lang.Long], raw: Long): java.util.TreeSet[java.lang.Long] = {
    val y = raw ^ Long.MinValue // order-preserving signed view of unsigned hash order
    if (b.size < k) b.add(y)
    else if (y < b.last()) { b.add(y); if (b.size > k) b.pollLast() }
    b
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def finish(b: java.util.TreeSet[java.lang.Long]): KmvSketch = {
    val arr = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    KmvSketch(arr.toIndexedSeq, b.size == k)
  }

  override def bufferEncoder: Encoder[java.util.TreeSet[java.lang.Long]] =
    Encoders.kryo[java.util.TreeSet[java.lang.Long]]
  override def outputEncoder: Encoder[KmvSketch] = Encoders.product[KmvSketch]
}
