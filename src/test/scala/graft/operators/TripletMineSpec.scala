package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TripletMineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // labels: 1 → {0, 1, 2}, 2 → {3, 4, 13, 14}, 3 → {5} (no positive),
  // 9 → {10, 11, 12} with 10/11 exact duplicates of 12's vector
  private lazy val vecs = Seq(
    (0L, 1, Seq(1.0f, 0.0f, 0.0f)),
    (1L, 1, Seq(0.9f, 0.1f, 0.0f)),   // easy positive for 0
    (2L, 1, Seq(0.5f, 0.5f, 0.0f)),   // HARD positive for 0 (lowest cos)
    (3L, 2, Seq(0.95f, 0.05f, 0.0f)), // HARD negative for 0 (highest cos)
    (4L, 2, Seq(0.0f, 1.0f, 0.0f)),
    (5L, 3, Seq(0.3f, 0.3f, 0.0f)),   // label 3's only member; z=0 keeps
                                      // it inside anchor 12's cos-0 tie
    (10L, 9, Seq(0.0f, 0.0f, 1.0f)),
    (11L, 9, Seq(0.0f, 0.0f, 1.0f)),
    (12L, 9, Seq(0.0f, 0.0f, 1.0f)),
    (13L, 2, Seq(0.0f, 1.0f, 0.0f)),
    (14L, 2, Seq(0.0f, 1.0f, 0.0f)))
    .toDF("vec_id", "label", "embedding")

  private lazy val prepped = vecs
    .select(col("vec_id").as("id"), col("label"), col("embedding").as("v"))
    .withColumn("nrm", Similarity.norm(col("v")))

  private lazy val mined = Similarity.tripletMine(prepped, prepped, minMargin = 0.1)
    .collect().map(r => r.getLong(0) -> r).toMap

  test("hardest positive is the least-similar same-label vector") {
    val r = mined(0L)
    assert(r.getLong(2) == 2L)                       // pos_id
    assert(math.abs(r.getDouble(3) - 0.707107) < 1e-6)
  }

  test("hardest negative is the most-similar different-label vector; violated margin flagged") {
    val r = mined(0L)
    assert(r.getLong(4) == 3L)                       // neg_id
    assert(r.getDouble(5) > 0.99)                    // neg_cos
    assert(r.getDouble(6) < 0.0)                     // margin = pos - neg
    assert(r.getLong(7) == 1L)                       // violates
  }

  test("equal-cosine ties break low for positives, high for negatives") {
    val r = mined(12L)
    // positives 10 and 11 are exact duplicates (cos = 1.0) → lowest id
    assert(r.getLong(2) == 10L)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
    // every negative is orthogonal (cos = 0.0) → highest id wins
    assert(r.getLong(4) == 14L)
    assert(r.getDouble(5) == 0.0)
    assert(r.getLong(7) == 0L)                       // margin 1.0, satisfied
  }

  test("anchors that cannot form a triplet are dropped") {
    assert(!mined.contains(5L))                      // label 3 has no positive
    assert(mined.keySet == Set(0L, 1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 14L))
  }
}
