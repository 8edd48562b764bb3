package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The audio fingerprint near-dup contract behind `audio_neardup`:
  * generated WAVs run the REAL RIFF/PCM decode path; a pitch-shifted
  * copy of a clip must land within the banded-Hamming accept, pure
  * noise must not, and the pipeline must be robust to undecodable
  * payloads. Mirrors the image aHash/pHash spec discipline.
  */
class AudioNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsOf(rows: Seq[(Long, String, Array[Byte])]): Set[(Long, Long)] =
    Multimodal.audioNearDups(rows.toDF("doc_id", "kind", "payload"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

  test("pitch-shifted duplicates admit; distinct melodies and noise reject") {
    val rows = Seq(
      (1L, "audio", Multimodal.synthToneWav(1, 1.0)),
      (2L, "audio", Multimodal.synthToneWav(1, 1.02)),  // planted dup of 1
      (3L, "audio", Multimodal.synthToneWav(42, 1.0)),  // different melody
      (4L, "audio", Multimodal.synthNoiseWav(1)),       // noise
      (5L, "audio", Multimodal.synthNoiseWav(2)))       // unrelated noise
    val got = pairsOf(rows)
    assert(got.contains((1L, 2L)), got)
    assert(!got.exists { case (a, b) => a == 4L || b == 4L || a == 5L || b == 5L },
      s"noise admitted: $got")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)), got)
  }

  test("fingerprints survive the WAV round-trip and reject garbage") {
    val fp1 = Multimodal.audioFingerprint(Multimodal.synthToneWav(7, 1.0))
    val fp2 = Multimodal.audioFingerprint(Multimodal.synthToneWav(7, 1.02))
    assert(fp1.isDefined && fp2.isDefined)
    val h = java.lang.Long.bitCount(fp1.get ^ fp2.get)
    assert(h <= 3, s"pitch-shift hamming $h")
    // gain invariance: the share rule ignores a global volume change
    val loud = Multimodal.synthToneWav(7, 1.0)
    assert(Multimodal.audioFingerprint(loud) == fp1)
    // undecodable payloads are dropped, not crashed on
    assert(Multimodal.audioFingerprint("not a wav".getBytes).isEmpty)
    assert(Multimodal.audioFingerprint(Array.emptyByteArray).isEmpty)
  }

  test("group shape: identical fingerprints collapse to ONE family row") {
    // three byte-identical clips (one fingerprint family of 3), one
    // pitch-shifted near-dup of that melody, one unrelated melody.
    val rows = Seq(
      (1L, "audio", Multimodal.synthToneWav(1, 1.0)),
      (2L, "audio", Multimodal.synthToneWav(1, 1.0)),
      (3L, "audio", Multimodal.synthToneWav(1, 1.0)),
      (4L, "audio", Multimodal.synthToneWav(1, 1.02)),
      (5L, "audio", Multimodal.synthToneWav(42, 1.0)))
    val got = Multimodal.audioNearDupGroups(rows.toDF("doc_id", "kind", "payload"))
      .as[(Long, Long, Int, Long, Long, Long)].collect().toSet
    // the size-3 family is ONE row (1,1,h=0,n=3,n=3,pairs=3), not 3 pair rows
    assert(got.contains((1L, 1L, 0, 3L, 3L, 3L)), got)
    // the near edge joins the family REP (1) with the shifted clip (4):
    // 3 docs x 1 doc = 3 implied member pairs
    val near = got.filter(t => t._3 > 0)
    assert(near.exists(t => t._1 == 1L && t._2 == 4L && t._4 == 3L &&
      t._5 == 1L && t._6 == 3L), got)
    // the unrelated melody appears in NO row
    assert(!got.exists(t => t._1 == 5L || t._2 == 5L), got)
    // group output never exceeds family count + near-edge count
    assert(got.size == 2, got)
  }

  test("non-audio kinds and undecodable rows drop out before the join") {
    val rows = Seq(
      (1L, "image", Multimodal.synthToneWav(1, 1.0)), // wrong kind: filtered
      (2L, "audio", "garbage-bytes".getBytes.asInstanceOf[Array[Byte]]),
      (3L, "audio", Multimodal.synthToneWav(1, 1.0)),
      (4L, "audio", Multimodal.synthToneWav(1, 1.02)))
    val got = pairsOf(rows)
    assert(got == Set((3L, 4L)), got)
  }
}
