package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Similarity

/** Range (ε-ball) search over the persisted IVF+PQ index: exact
  * precision by construction, admission monotonicity in the margin, and
  * the recall companion's flags on real data.
  */
class AnnRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def brutePairs(): Set[(Long, Long)] = {
    val prepped = Similarity.prep(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
    val qv = prepped.filter(col("id") % 50 === 0)
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    prepped.join(broadcast(qv), col("id") =!= col("q_id"))
      .filter(Similarity.cosine(col("qv"), col("qn"),
        col("v"), col("nrm")) >= ScaleQueries.RangeTau)
      .select(col("q_id"), col("id").as("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("every emitted pair is a true ε-ball member (exact precision)") {
    val truth = brutePairs()
    val out = ScaleQueries.annRange(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val pair = (r.getLong(0), r.getLong(1))
      assert(truth.contains(pair), s"$pair not in brute truth")
      assert(r.getDouble(2) >= ScaleQueries.RangeTau - 1e-6)
    }
  }

  test("admission is monotone in the margin: tighter ⊆ looser") {
    val tight = ScaleQueries.annRangeAt(spark, dir, margin = 0.08)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = ScaleQueries.annRangeAt(spark, dir, margin = 0.30)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(loose))
    assert(loose.size >= tight.size)
  }

  test("filtered range is exactly the unfiltered set restricted to same-label " +
       "pairs: the ADC predicate never changes admission scores") {
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val unfiltered = ScaleQueries.annRange(spark, dir)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = ScaleQueries.annRangeFiltered(spark, dir)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered == unfiltered.filter { case (q, n) => labels(q) == labels(n) })
  }

  test("filtered recall companion holds its floor and invariants") {
    val row = ScaleQueries.annRangeFilteredRecall(spark, dir).collect().head
    assert(row.getLong(1) == 1L, "filtered recall under floor")
    assert(row.getLong(2) == 1L, "filtered precision invariant broken")
  }

  test("recall companion holds its floor and the precision invariant") {
    val row = ScaleQueries.annRangeRecall(spark, dir).collect().head
    assert(row.getLong(0) == brutePairs().size) // exact truth count
    assert(row.getLong(1) == 1L, "recall under floor")
    assert(row.getLong(2) == 1L, "precision invariant broken")
  }
}
