package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Coreset]] on planted line geometry: the registered `coreset_*`
  * queries prove the greedy recurrence is exact (oracle replay); this
  * spec proves it SELECTS right — three separated site pairs must
  * yield one center per site, the documented lowest-id tie-break must
  * fire on an exactly-equidistant pair, and the coverage report must
  * recover the planted radii.
  */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 4

  /** Six points on a line at 0, 0.5, 4, 4.5, 8, 8.5 (ids 1..6) — every
    * coordinate binary-exact in float32, so the planted tie is EXACT:
    * after seed (id 1) and the far end (id 6 at 8.5), ids 3 and 4 are
    * both exactly 4.0 from the chosen set (min(4, 4.5) and min(4.5, 4))
    * — the tie the lowest-id rule must break to id 3. (0.1-style
    * coordinates were the first cut: float32 rounding made id 4's
    * distance win by 5e-7 and no tie ever fired.)
    */
  private lazy val line = Seq(
    (1L, 0.0f), (2L, 0.5f), (3L, 4.0f), (4L, 4.5f), (5L, 8.0f), (6L, 8.5f)
  ).map { case (id, x) => (id, Seq(x, 0.0f, 0.0f, 0.0f)) }
    .toDF("vec_id", "embedding")

  test("greedy picks one center per site; the exact tie breaks to the lowest id") {
    val cs = Coreset.kCenter(line, "vec_id", "embedding", k = 3, d = D)
    assert(cs.map(c => (c.rank, c.id)) == Seq((1, 1L), (2, 6L), (3, 3L)))
    assert(cs(1).dist == 8.5)
    assert(cs(2).dist == 4.0) // the tie distance itself
  }

  test("cover assigns each site pair to its center with the planted radius") {
    val cs = Coreset.kCenter(line, "vec_id", "embedding", k = 3, d = D)
    val rows = Coreset.cover(line, "embedding", cs, D)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((1, 1L, 2L, 0.5), (2, 6L, 2L, 0.5), (3, 3L, 2L, 0.5)))
  }

  test("radius trajectory is non-increasing on the real table") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cs = Coreset.kCenter(e, "vec_id", "embedding", k = 5, d = 64)
    val traj = cs.drop(1).map(_.dist)
    assert(traj == traj.sorted.reverse, traj)
    assert(cs.map(_.id).distinct.size == 5)
  }
}
