package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Finished heavy-hitters summary: keys with their (lower-bound) counts,
  * sorted by (count desc, key asc).
  */
final case class HeavyHitters(keys: Seq[String], counts: Seq[Long])

/** Misra-Gries frequent-items sketch as a mergeable typed Aggregator.
  *
  * Capacity-c summary of a stream of n items guarantees: every item with
  * true frequency > n/(c+1) is present, and each reported count
  * undercounts its true frequency by at most n/(c+1). Merging two
  * summaries (counter addition, then decrement by the (c+1)-largest
  * count) preserves the bound — the mergeable-summaries result of
  * Agarwal et al. (PODS'12) — so map-side partials combine freely and
  * the shuffle carries at most c counters per (group, partition)
  * regardless of input size or skew: the 100 TB story next to the exact
  * explode+count `top_words` path.
  *
  * The buffer is a mutable HashMap under a kryo encoder: ObjectHashAgg
  * keeps it as a live JVM object between rows, so reduce() mutates
  * in place and only spills/shuffles pay serialization.
  */
final class HeavyHittersAgg(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], HeavyHitters] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], key: String): mutable.HashMap[String, Long] = {
    if (b.contains(key)) b(key) += 1L
    else if (b.size < capacity) b(key) = 1L
    else {
      // decrement-all step; drop exhausted counters
      val dead = List.newBuilder[String]
      b.keysIterator.foreach { k =>
        if (b(k) == 1L) dead += k else b(k) -= 1L
      }
      dead.result().foreach(b.remove)
    }
    b
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, v) => b1(k) = b1.getOrElse(k, 0L) + v }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-largest count from everything; at most
      // `capacity` counters can stay positive afterwards
      val cut = b1.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      val dead = List.newBuilder[String]
      b1.keysIterator.foreach { k =>
        if (b1(k) <= cut) dead += k else b1(k) -= cut
      }
      dead.result().foreach(b1.remove)
    }
    b1
  }

  override def finish(b: mutable.HashMap[String, Long]): HeavyHitters = {
    val sorted = b.toSeq.sortBy { case (k, v) => (-v, k) }
    HeavyHitters(sorted.map(_._1), sorted.map(_._2))
  }

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[HeavyHitters] = Encoders.product[HeavyHitters]
}
