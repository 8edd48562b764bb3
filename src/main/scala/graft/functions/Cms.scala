package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a mergeable typed Aggregator — the bounded-memory
  * FREQUENCY sketch, completing the sketch family: HLL answers "how many
  * distinct", KMV answers "how large is the intersection", Misra-Gries
  * answers "which keys are heavy", CMS answers "how often does THIS key
  * occur" over an unbounded key domain in depth·width longs per group.
  *
  * The input is the row's `depth` pre-computed bucket indices (one per
  * hash row), computed IN SQL as `pmod(xxhash64(key, i), width)` — the
  * same expression the estimate side evaluates against the finished
  * counter array, so sketch build and point lookup can never disagree on
  * hashing (and the update stays a plain array increment here).
  *
  * Counters only ever ADD, so merge is elementwise sum — associative and
  * commutative, which is the mergeable-summaries property that lets
  * map-side partials combine and daily sketches roll up to weeks without
  * touching raw rows (sketch(A ⊎ B) = sketch(A) + sketch(B), proven as
  * an equality in CmsProps). Point estimate = min over hash rows of the
  * addressed counter: each row's counter = true count + collisions ≥
  * true count, so the estimate NEVER undercounts (also in CmsProps);
  * expected overestimate per row is N/width.
  */
final class CmsAgg(depth: Int, width: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
  require(depth > 0 && width > 0, s"bad CMS shape: $depth x $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], idxs: Seq[Int]): Array[Long] = {
    var i = 0
    while (i < depth) { b(i * width + idxs(i)) += 1L; i += 1 }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
