package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored row flowing into [[TopKAgg]]: an ordering score plus the
  * id payload to carry. Ties on score resolve to the smaller id, so the
  * aggregate is fully deterministic.
  */
final case class Scored(score: Double, id: Long)

/** Bounded top-k buffer: parallel arrays sorted by (score desc, id asc),
  * never longer than k. (A Product of Seqs, so Spark's product encoder
  * serializes it without kryo.)
  */
final case class TopKBuf(scores: Seq[Double], ids: Seq[Long])

/** Top-k per group as an AGGREGATE, not a window.
  *
  * `row_number().over(partitionBy(g).orderBy(s))` + `filter(rk <= k)`
  * sorts every group's full row set after shuffling all of it. This
  * aggregator keeps a k-bounded buffer instead, so partial aggregation
  * (map-side combine) reduces each group to ≤ k rows per input partition
  * BEFORE the shuffle — at 100 TB the shuffle carries k·groups·partitions
  * rows instead of the whole table, and nothing is ever globally sorted.
  *
  * The reference has no top-k at all (SURVEY.md §2.6); this is the
  * scale-path rendition of its head-N preview semantics applied per
  * group.
  */
final class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  private def rebound(scores: Seq[Double], ids: Seq[Long]): TopKBuf = {
    val best = scores.zip(ids).sortBy { case (s, i) => (-s, i) }.take(k)
    TopKBuf(best.map(_._1), best.map(_._2))
  }

  override def zero: TopKBuf = TopKBuf(Nil, Nil)

  override def reduce(b: TopKBuf, a: Scored): TopKBuf =
    // fast reject: full buffer and the new row can't displace the floor
    if (b.scores.length >= k &&
        (a.score < b.scores.last ||
          (a.score == b.scores.last && a.id >= b.ids.last))) b
    else rebound(b.scores :+ a.score, b.ids :+ a.id)

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    rebound(b1.scores ++ b2.scores, b1.ids ++ b2.ids)

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
