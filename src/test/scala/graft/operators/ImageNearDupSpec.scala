package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The registered image near-dup surface on planted synthetic PNGs:
  * jittered re-grades admit at h ≤ 3, distinct patterns reject (the
  * measured cross-seed floor is Hamming 18), and the banded join's
  * found set equals the planted truth EXACTLY — the block-pattern
  * space has no coincidental tail, unlike the coarse audio melodies.
  */
class ImageNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted jittered pairs admit; distinct patterns reject; found = truth") {
    import spark.implicits._
    // 35 docs: ids with id % 7 == 3 replay (id-3)'s pattern jittered
    val rows = (0L until 35L).map { id =>
      val dup = id % 7 == 3 && id >= 3
      val seed = if (dup) id - 3 else id
      (id, "image", Multimodal.synthBlockPng(seed, jitter = dup))
    }
    val found = Multimodal.imagePhashNearDups(
        rows.toDF("doc_id", "kind", "payload"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = (0L until 35L).filter(id => id % 7 == 3 && id >= 3)
      .map(id => (id - 3, id)).toSet
    assert(truth.nonEmpty)
    // recall: pHash absorbs the jitter for (almost) every planted pair —
    // measured 98.5% at n=400; at this size expect all
    assert((truth -- found).size <= truth.size / 10,
      s"missed ${truth -- found}")
    // precision: nothing but planted pairs (cross floor is h=18)
    assert((found -- truth).isEmpty, s"coincidental pairs: ${found -- truth}")
  }

  test("cross-codec planted pair admits: JPEG re-encode of a PNG pattern") {
    import spark.implicits._
    // same pattern, one side PNG, one side JPEG(0.9) — with and
    // without the jitter regrade on the JPEG side
    val rows = Seq(
      (1L, "image", Multimodal.synthBlockPng(7L, jitter = false)),
      (2L, "image", Multimodal.synthBlockJpeg(7L, jitter = false)),
      (3L, "image", Multimodal.synthBlockJpeg(7L, jitter = true)),
      (4L, "image", Multimodal.synthBlockJpeg(9L, jitter = false)))
    val found = Multimodal.imagePhashNearDups(
        rows.toDF("doc_id", "kind", "payload"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 2L)), s"pure re-encode must admit: $found")
    assert(found.contains((1L, 3L)), s"re-encode + regrade must admit: $found")
    assert(!found.exists { case (a, b) => a == 4L || b == 4L },
      s"distinct JPEG pattern admitted: $found")
    // the cross-codec pHash distance itself: re-encode loss stays far
    // inside the h <= 3 accept (flat 8x8 blocks align with JPEG DCT)
    val hp = java.lang.Long.bitCount(
      Multimodal.pHash(Multimodal.synthBlockPng(7L, jitter = false)).get ^
        Multimodal.pHash(Multimodal.synthBlockJpeg(7L, jitter = false)).get)
    assert(hp <= 1, s"pure JPEG re-encode moved pHash by $hp bits")
  }

  test("undecodable payloads drop out before the join") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image", Multimodal.synthBlockPng(1L, jitter = false)),
      (2L, "image", "not a png".getBytes("UTF-8")))
    val found = Multimodal.imagePhashNearDups(
      rows.toDF("doc_id", "kind", "payload"), maxHamming = 3).collect()
    assert(found.isEmpty)
  }
}
