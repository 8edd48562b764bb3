package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Audio robustness beyond the clean pitch shift — the round-14 §9.2
  * caveat ("contour constants are synth-tuned; vibrato or polyphony
  * would need the cell width / band layout re-measured") MEASURED:
  *
  *   - 6 Hz / 2 % vibrato does NOT break the half-semitone contour
  *     cell: across 200 planted pairs, zero contour band misses and
  *     97 % of cells byte-identical (drift ≤ 1 cell) — the candidate
  *     key holds, no cell-width re-parametrization needed.
  *   - What vibrato DOES cost is Hamming-verify headroom (spectral
  *     smear flips share bits): single-sided vibrato recall 77 % vs
  *     92 % plain over 100 seeds — above the 70 floor.
  *   - Polyphony (a major third on BOTH sides — same arrangement,
  *     shifted performance) is absorbed: 93 % over 100 seeds.
  *   - A chord added on ONE side only (a different arrangement — a
  *     remix, not a near-duplicate) admits measurably LESS (66 %)
  *     than the same-arrangement classes: the gate separates them.
  *   - G.711 μ-law companding (round 16, the JDK-legal lossy codec):
  *     a full encode→WAVE→decode round trip costs AT MOST 1 share bit
  *     and zero contour-band misses over 50 seeds, and a
  *     μ-law-distributed shifted re-performance admits within 10pp of
  *     the plain class — no re-parametrization needed.
  *
  * These classes are planted in the `audio_neardup` corpus
  * (ScaleQueries.audioPayloads, residues mod 21), so the registered
  * recall/precision floors measure them continuously.
  */
class VibratoChordSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Seeds = 50L

  private def admitted(mk: Long => (Array[Byte], Array[Byte])): Int = {
    val rows = (0L until Seeds).flatMap { s =>
      val (a, b) = mk(s)
      Seq((s * 2, "audio", a), (s * 2 + 1, "audio", b))
    }
    val got = Multimodal.audioNearDups(rows.toDF("doc_id", "kind", "payload"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    (0L until Seeds).count(s => got.contains((s * 2, s * 2 + 1)))
  }

  test("single-sided vibrato re-performance stays above the 70 % floor") {
    val n = admitted(s => (Multimodal.synthToneWav(s, 1.0),
      Multimodal.synthToneWav(s, 1.02, vibrato = 0.02)))
    assert(n >= (Seeds * 0.70).toInt, s"vibrato recall $n/$Seeds")
  }

  test("both-sided chord (polyphonic melody, shifted) stays above 80 %") {
    val n = admitted(s => (Multimodal.synthToneWav(s, 1.0, chord = true),
      Multimodal.synthToneWav(s, 1.02, chord = true)))
    assert(n >= (Seeds * 0.80).toInt, s"chord recall $n/$Seeds")
  }

  test("chord + vibrato on both sides (hard polyphonic performance) holds 80 %") {
    val n = admitted(s =>
      (Multimodal.synthToneWav(s, 1.0, vibrato = 0.02, chord = true),
       Multimodal.synthToneWav(s, 1.02, vibrato = 0.02, chord = true)))
    assert(n >= (Seeds * 0.80).toInt, s"chord+vibrato recall $n/$Seeds")
  }

  test("the half-semitone contour cell does not break under vibrato: " +
       "zero candidate-band misses, cell drift bounded by one") {
    def bandsOf(c: Array[Int]): Set[Seq[Int]] =
      (0 to 2).map(b => c.slice(b * 2, b * 2 + 3).toSeq).toSet
    var bandMiss = 0
    var maxDrift = 0
    for (s <- 0L until Seeds) {
      (Multimodal.audioSignature(Multimodal.synthToneWav(s, 1.0)),
       Multimodal.audioSignature(Multimodal.synthToneWav(s, 1.02, vibrato = 0.02))) match {
        case (Some((_, c1)), Some((_, c2))) =>
          if (bandsOf(c1).intersect(bandsOf(c2)).isEmpty) bandMiss += 1
          c1.zip(c2).foreach { case (x, y) => maxDrift = math.max(maxDrift, math.abs(y - x)) }
        case _ => fail(s"undecodable synth clip at seed $s")
      }
    }
    assert(bandMiss == 0, s"contour band misses under vibrato: $bandMiss")
    assert(maxDrift <= 1, s"contour cell drift $maxDrift > 1 half-semitone cell")
  }

  // ------------------------------------------ inharmonic rich timbre

  test("inharmonic percussive timbre does not break the contour cell: " +
       "zero candidate-band misses, drift bounded by one") {
    def bandsOf(c: Array[Int]): Set[Seq[Int]] =
      (0 to 2).map(b => c.slice(b * 2, b * 2 + 3).toSeq).toSet
    var bandMiss = 0
    var maxDrift = 0
    for (s <- 0L until Seeds) {
      (Multimodal.audioSignature(Multimodal.synthToneWav(s, 1.0, rich = true)),
       Multimodal.audioSignature(
         Multimodal.synthToneWav(s, 1.02, rich = true))) match {
        case (Some((_, c1)), Some((_, c2))) =>
          if (bandsOf(c1).intersect(bandsOf(c2)).isEmpty) bandMiss += 1
          c1.zip(c2).foreach { case (x, y) =>
            maxDrift = math.max(maxDrift, math.abs(y - x)) }
        case _ => fail(s"undecodable rich synth clip at seed $s")
      }
    }
    assert(bandMiss == 0, s"contour band misses under rich timbre: $bandMiss")
    assert(maxDrift <= 1, s"contour drift $maxDrift > 1 cell under rich timbre")
  }

  test("the share-bit verify gates TIMBRAL identity: a pitch-shifted " +
       "inharmonic re-performance admits less than the pure-tone classes, " +
       "and cross-timbre pairs admit nothing") {
    // Measured (round-15 continuation, 100 seeds): rich both-sided 36 %,
    // rich cross-timbre (plain vs rich, same melody) 0 % — the 6-partial
    // inharmonic comb moves across share-band boundaries under the
    // ×1.02 shift, so the Hamming verify treats it as a different
    // RENDITION even though the contour (melody) key holds above. This
    // is the documented boundary of the share-bit verify, pinned as
    // SEPARATIONS (not absolutes): the same-timbre pure-tone class must
    // stay strictly above the rich class, and different-instrument
    // versions of the same melody must never be admitted as near-dups.
    val plain = admitted(s => (Multimodal.synthToneWav(s, 1.0),
      Multimodal.synthToneWav(s, 1.02)))
    val rich = admitted(s => (Multimodal.synthToneWav(s, 1.0, rich = true),
      Multimodal.synthToneWav(s, 1.02, rich = true)))
    val cross = admitted(s => (Multimodal.synthToneWav(s, 1.0),
      Multimodal.synthToneWav(s, 1.02, rich = true)))
    assert(rich < plain, s"rich admit $rich !< plain admit $plain")
    assert(cross == 0, s"cross-timbre pairs admitted: $cross")
  }

  test("additive room noise does not degrade the gate: noisy re-recordings " +
       "admit at the plain-class rate up to ~15 dB SNR") {
    // Measured (100 seeds): 91 % admits at noise amplitude 0.02, 0.05
    // AND 0.1 against 92 % plain — the per-segment FFT magnitude peaks
    // the signature reads sit far above a white-noise floor, and the
    // contour shows 0 band misses / drift ≤ 1 at amp 0.05. Pin the
    // moderate level at the vibrato floor.
    val n = admitted(s => (Multimodal.synthToneWav(s, 1.0),
      Multimodal.synthToneWav(s, 1.02, noise = 0.05)))
    assert(n >= (Seeds * 0.80).toInt, s"noisy-dup recall $n/$Seeds")
  }

  test("the cover matcher accepts on the contour what the near-dup " +
       "verify refuses: cross-timbre same-melody pairs") {
    val rows = (0L until Seeds).flatMap { s =>
      Seq((s * 2, "audio", Multimodal.synthToneWav(s, 1.0)),
        (s * 2 + 1, "audio",
          Multimodal.synthToneWav(s, 1.05, rich = true)))
    }
    val df = rows.toDF("doc_id", "kind", "payload")
    val nd = Multimodal.audioNearDups(df)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val cv = Multimodal.audioCoverMatches(df)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val ndHits = (0L until Seeds).count(s => nd.contains((s * 2, s * 2 + 1)))
    val cvHits = (0L until Seeds).count(s => cv.contains((s * 2, s * 2 + 1)))
    assert(ndHits == 0, s"near-dup admitted cross-timbre pairs: $ndHits")
    assert(cvHits >= (Seeds * 0.70).toInt, s"cover recall $cvHits/$Seeds")
  }

  test("G.711 mu-law round trip is read back as real audio with a near-" +
       "identical fingerprint: companding noise costs at most 1 share bit") {
    var maxHam = 0
    var bandMiss = 0
    for (s <- 0L until Seeds) {
      val pcm = Multimodal.synthToneWav(s, 1.0)
      val mu = Multimodal.toMulawWav(pcm)
      assert(mu.length < pcm.length, "mu-law file must be ~half the PCM size")
      (Multimodal.audioSignature(pcm), Multimodal.audioSignature(mu)) match {
        case (Some((h1, c1)), Some((h2, c2))) =>
          maxHam = math.max(maxHam, java.lang.Long.bitCount(h1 ^ h2))
          def bandsOf(c: Array[Int]): Set[Seq[Int]] =
            (0 to 2).map(b => c.slice(b * 2, b * 2 + 3).toSeq).toSet
          if (bandsOf(c1).intersect(bandsOf(c2)).isEmpty) bandMiss += 1
        case _ => fail(s"mu-law clip undecodable at seed $s")
      }
    }
    assert(maxHam <= 1, s"companding flipped $maxHam share bits")
    assert(bandMiss == 0, s"contour band misses under mu-law: $bandMiss")
    // A-law (the European G.711 curve) rides the same decode path with
    // the same bound
    var aHam = 0
    for (s <- 0L until Seeds) {
      val pcm = Multimodal.synthToneWav(s, 1.0)
      (Multimodal.audioSignature(pcm),
       Multimodal.audioSignature(Multimodal.toAlawWav(pcm))) match {
        case (Some((h1, _)), Some((h2, _))) =>
          aHam = math.max(aHam, java.lang.Long.bitCount(h1 ^ h2))
        case _ => fail(s"A-law clip undecodable at seed $s")
      }
    }
    assert(aHam <= 1, s"A-law companding flipped $aHam share bits")
  }

  test("a mu-law-distributed pitch-shifted re-performance admits at the " +
       "plain-class rate: companding does not stack with the shift") {
    val plain = admitted(s => (Multimodal.synthToneWav(s, 1.0),
      Multimodal.synthToneWav(s, 1.02)))
    val mu = admitted(s => (Multimodal.synthToneWav(s, 1.0),
      Multimodal.toMulawWav(Multimodal.synthToneWav(s, 1.02))))
    assert(mu >= (Seeds * 0.70).toInt, s"mu-law dup recall $mu/$Seeds")
    assert(math.abs(mu - plain) <= (Seeds * 0.10).toInt,
      s"mu-law admit $mu deviates from plain $plain by more than 10pp")
  }

  test("arrangement change (chord on ONE side) admits strictly less than " +
       "performance change (chord on both): the verify differentiates them") {
    // A remix is not fully rejected — the fundamental still dominates —
    // but the contour + share-bit gate measurably separates it (66 % vs
    // 93 % over 100 seeds in the round-15 measurement) from the
    // same-arrangement class. Pin the separation, not absolutes.
    val remix = admitted(s => (Multimodal.synthToneWav(s, 1.0),
      Multimodal.synthToneWav(s, 1.02, chord = true)))
    val sameArr = admitted(s => (Multimodal.synthToneWav(s, 1.0, chord = true),
      Multimodal.synthToneWav(s, 1.02, chord = true)))
    assert(remix < sameArr, s"remix admit $remix !< same-arrangement admit $sameArr")
    assert(remix <= (Seeds * 0.80).toInt, s"remix admit rate too high: $remix/$Seeds")
  }
}
