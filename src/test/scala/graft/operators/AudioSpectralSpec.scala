package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Real-DSP coverage for the FFT spectral kernel: synthesized tones must
  * land in the right frequency bin/band after a full WAV encode →
  * decode → window → FFT → band-fold pass, and non-audio rows must pass
  * through unharmed in the frame operator.
  */
class AudioSpectralSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sineWav(hz: Double, rate: Int, n: Int, amp: Double = 0.6): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    for (f <- 0 until n) {
      val s = math.round(math.sin(2 * math.Pi * hz * f / rate) * amp * 32767).toInt
      pcm(2 * f) = (s & 0xFF).toByte
      pcm(2 * f + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("fft puts a pure on-bin cosine's energy in its bin") {
    val n = 64
    val k0 = 5
    val re = Array.tabulate(n)(s => math.cos(2 * math.Pi * k0 * s / n))
    val im = new Array[Double](n)
    Multimodal.fft(re, im)
    def mag(k: Int) = math.sqrt(re(k) * re(k) + im(k) * im(k))
    assert(math.abs(mag(k0) - n / 2.0) < 1e-9)             // n/2 at ±k0
    val leak = (0 until n).filter(k => k != k0 && k != n - k0).map(mag).max
    assert(leak < 1e-9, s"spectral leakage: $leak")
  }

  test("440 Hz sine dominates band 0 with the right dominant frequency") {
    val Some((dom, w)) = Multimodal.audioSpectral(sineWav(440, 8000, 4000))
    assert(math.abs(dom - 440) <= 16, s"dominant $dom")
    assert(w.length == 8 && math.abs(w.sum - 1f) < 1e-4f)
    assert(w(0) > 0.5f, w.toSeq.toString)
  }

  test("3 kHz sine lands in band 6") {
    val Some((dom, w)) = Multimodal.audioSpectral(sineWav(3000, 8000, 4000))
    assert(math.abs(dom - 3000) <= 16, s"dominant $dom")
    assert(w(6) == w.max, w.toSeq.toString)
  }

  test("silence reports zero dominant and uniform bands, not NaNs") {
    val Some((dom, w)) = Multimodal.audioSpectral(sineWav(440, 8000, 4000, amp = 0.0))
    assert(dom == 0)
    assert(w.forall(x => math.abs(x - 0.125f) < 1e-6f))
  }

  test("spectralPayloads decodes audio rows and passes others through") {
    import spark.implicits._
    val wav = sineWav(440, 8000, 4000)
    val out = Multimodal.spectralPayloads(
        Seq((1L, "audio", wav),
            (2L, "audio", "not a wav".getBytes("UTF-8")),
            (3L, "image", wav)).toDF("doc_id", "kind", "payload"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(2), r.getInt(3)))).toMap
    assert(out(1L)._1 && math.abs(out(1L)._2 - 440) <= 16)
    assert(!out(2L)._1 && !out(3L)._1)
  }
}
