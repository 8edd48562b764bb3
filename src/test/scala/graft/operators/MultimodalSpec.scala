package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("payload plumbing: binary column + kind metadata, decode returns typed rows") {
    val docs = Seq((0L, "src0", "hello world"), (1L, "src1", "other doc"), (2L, "src2", "third"))
      .toDF("doc_id", "source", "text")
    val decoded = Multimodal.decode(Multimodal.withPayload(docs)).collect().sortBy(_.doc_id)
    assert(decoded.length == 3)
    assert(decoded.map(_.kind).toSeq == Seq("image", "audio", "video"))
    assert(decoded(0).byte_len == "hello world".getBytes("UTF-8").length)
    assert(decoded.forall(m => m.width >= 16 && m.height >= 16 && m.features.length == 8))
    // video kind gets a frame count; stills get exactly 1
    assert(decoded(2).n_frames >= 1 && decoded(0).n_frames == 1)
  }

  test("decode is deterministic (same payload -> same features)") {
    val docs = Seq((0L, "s", "same text"), (1L, "s", "same text")).toDF("doc_id", "source", "text")
    val out = Multimodal.decode(Multimodal.withPayload(docs)).collect()
    // doc 0 is 'image', doc 1 is 'audio', but features depend only on bytes
    assert(out(0).features.toSeq == out(1).features.toSeq)
    assert(out(0).width == out(1).width)
  }

  test("resize preserves aspect ratio and bounds both dimensions") {
    val docs = Seq((0L, "s", "some payload text here")).toDF("doc_id", "source", "text")
    val before = Multimodal.decode(Multimodal.withPayload(docs)).head()
    val after = Multimodal.resize(
      Multimodal.decode(Multimodal.withPayload(docs)), 64, 64).head()
    assert(after.width <= 64 && after.height <= 64)
    val ratioBefore = before.width.toDouble / before.height
    val ratioAfter  = after.width.toDouble / after.height
    assert(math.abs(ratioBefore - ratioAfter) / ratioBefore < 0.1)
  }

  test("frame sampling emits one row per strided frame; stills emit frame 0") {
    val docs = Seq(
      (0L, "s", "img doc"),                  // doc 0 -> image (1 frame)
      (2L, "s", "video doc with frames"))    // doc 2 -> video (n frames)
      .toDF("doc_id", "source", "text")
    val frames = Multimodal.sampleFrames(
      Multimodal.decode(Multimodal.withPayload(docs)), stride = 7)
      .collect().groupBy(_.getLong(0))
    assert(frames(0L).map(_.getInt(2)).toSeq == Seq(0))
    val vidIdx = frames(2L).map(_.getInt(2)).toSeq
    assert(vidIdx.head == 0 && vidIdx == vidIdx.sorted)
    assert(vidIdx.zip(vidIdx.tail).forall { case (a, b) => b - a == 7 })
  }

  test("image branch decodes a real PNG: dimensions round-trip, features are pixel stats") {
    import java.awt.image.BufferedImage
    // 37x21 red/blue checkerboard — odd dims so the two colors split 389/388
    val img = new BufferedImage(37, 21, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 21; x <- 0 until 37)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xFF0000 else 0x0000FF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val bytes = baos.toByteArray
    val out = Multimodal.decode(
      Seq((42L, "image", bytes)).toDF("doc_id", "kind", "payload")).head()
    assert(out.width == 37 && out.height == 21 && out.n_frames == 1)
    assert(out.byte_len == bytes.length)
    // red and blue means ~0.5 each, green exactly 0, alpha exactly 1
    assert(out.features(1) == 0f && out.features(3) == 1f)
    assert(math.abs(out.features(0) - 0.5f) < 0.01f)
    assert(math.abs(out.features(2) - 0.5f) < 0.01f)
    // every pixel lands in a luminance bin; bins sum to 1
    assert(math.abs(out.features.drop(4).sum - 1f) < 1e-5f)
  }

  test("jpeg decodes too; undecodable image bytes fall back to the deterministic stub") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(8, 5, BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val jpeg = Multimodal.decode(
      Seq((0L, "image", baos.toByteArray)).toDF("doc_id", "kind", "payload")).head()
    assert(jpeg.width == 8 && jpeg.height == 5)

    val textBytes = "not an image at all".getBytes("UTF-8")
    val fake = Multimodal.decode(
      Seq((1L, "image", textBytes)).toDF("doc_id", "kind", "payload")).head()
    val (w, h, f, feats) = Multimodal.decodeStub("image", textBytes)
    assert(fake.width == w && fake.height == h && fake.n_frames == f)
    assert(fake.features.toSeq == feats.toSeq)
  }

  test("audio branch decodes a real WAV: rate/channels/frames round-trip, RMS envelope") {
    import javax.sound.sampled._
    // 8 kHz mono 16-bit PCM, 1600 frames: first half silence, second
    // half a full-scale square wave -> RMS envelope 0,0,0,0,1,1,1,1
    val rate = 8000f
    val frames = 1600
    val pcm = new Array[Byte](frames * 2)
    for (f <- frames / 2 until frames) {
      val v: Short = if (f % 2 == 0) 32767 else -32768
      pcm(f * 2) = (v & 0xFF).toByte
      pcm(f * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    val bytes = baos.toByteArray

    val out = Multimodal.decode(
      Seq((7L, "audio", bytes)).toDF("doc_id", "kind", "payload")).head()
    assert(out.width == 8000 && out.height == 1 && out.n_frames == 1600)
    assert(out.byte_len == bytes.length)
    val env = out.features
    assert(env.take(4).forall(_ < 0.01f), env.toSeq.toString)
    assert(env.drop(4).forall(v => math.abs(v - 1f) < 0.01f), env.toSeq.toString)

    // non-audio bytes under kind=audio fall back to the stub
    val textBytes = "definitely not a wav".getBytes("UTF-8")
    val fake = Multimodal.decode(
      Seq((8L, "audio", textBytes)).toDF("doc_id", "kind", "payload")).head()
    val (w, h, f, feats) = Multimodal.decodeStub("audio", textBytes)
    assert(fake.width == w && fake.height == h && fake.n_frames == f)
    assert(fake.features.toSeq == feats.toSeq)
  }

  test("decode runs on the real documents table end-to-end") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = Multimodal.decode(Multimodal.withPayload(docs)).count()
    assert(n == docs.count())
  }

  private def gradientPng(tweak: Boolean, invert: Boolean): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v0 = (x * 255) / 63             // left-to-right ramp
      val v = if (invert) 255 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    // near-dup: blow out ONE dark 8x8 cell to white — flips that cell's
    // bit (and at most a borderline neighbor via the shifted mean), the
    // "small local edit" a perceptual hash is built to keep close
    if (tweak) for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("aHash: near-identical images land within Hamming 3 of each other; " +
       "an inverted image does not") {
    val base = Multimodal.aHash(gradientPng(tweak = false, invert = false)).get
    val near = Multimodal.aHash(gradientPng(tweak = true, invert = false)).get
    val far  = Multimodal.aHash(gradientPng(tweak = false, invert = true)).get
    val d = java.lang.Long.bitCount(base ^ near)
    assert(d >= 1 && d <= 3) // visible but small — the near-dup band
    assert(java.lang.Long.bitCount(base ^ far) > 16)
    assert(Multimodal.aHash("not an image".getBytes("UTF-8")).isEmpty)
  }

  /** 64×64 textured image with a DENSE low-frequency spectrum (a
    * sinusoid mixture — a checkerboard was tried first and is the
    * counter-example: its energy sits on 3 DCT coefficients, the other
    * 60 are ~0, the median is ~0, and bits flip on numerical noise;
    * natural images are 1/f-dense, which is what pHash's median
    * threshold assumes). `warp` adds a smooth top-to-bottom luma ramp
    * 0..40 (never clamping: base stays in [20, 180]) — the
    * vignette/gradient-overlay transform a DCT hash absorbs into one
    * low-frequency coefficient but a raw-cell mean threshold does not.
    */
  private def texturePng(warp: Boolean, invert: Boolean): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val base = 100 + 50 * math.sin(x / 4.7) * math.cos(y / 6.3) +
        30 * math.sin((x + 2 * y) / 8.9)
      val ramp = if (warp) y * 40.0 / 63 else 0.0
      val v0 = math.max(0, math.min(255, (base + ramp).toInt))
      val v = if (invert) 255 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("pHash: smooth luma warp stays within Hamming 3 and strictly " +
       "beats aHash on the same pair; inversion lands far; garbage None") {
    val base = texturePng(warp = false, invert = false)
    val warp = texturePng(warp = true, invert = false)
    val inv  = texturePng(warp = false, invert = true)
    val pBase = Multimodal.pHash(base).get
    val pWarp = Multimodal.pHash(warp).get
    val pInv  = Multimodal.pHash(inv).get
    val aBase = Multimodal.aHash(base).get
    val aWarp = Multimodal.aHash(warp).get
    val pd = java.lang.Long.bitCount(pBase ^ pWarp)
    val ad = java.lang.Long.bitCount(aBase ^ aWarp)
    assert(pd <= 3, s"pHash warp distance $pd")
    assert(pd < ad, s"pHash $pd not < aHash $ad — the warp-robustness claim")
    assert(java.lang.Long.bitCount(pBase ^ pInv) > 16)
    assert(Multimodal.pHash("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imagePhashNearDups finds exactly the planted warp pair via the " +
       "shared banded join") {
    val rows = Seq(
      (1L, "image", texturePng(warp = false, invert = false)),
      (2L, "image", texturePng(warp = true, invert = false)),
      (3L, "image", texturePng(warp = false, invert = true)),
      (4L, "image", "undecodable".getBytes("UTF-8")),
      (5L, "audio", texturePng(warp = false, invert = false)))
      .toDF("doc_id", "kind", "payload")
    val out = Multimodal.imagePhashNearDups(rows, maxHamming = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("imageNearDups finds exactly the planted perceptual pair via the " +
       "banded bucket join, never comparing unrelated images") {
    val rows = Seq(
      (1L, "image", gradientPng(tweak = false, invert = false)),
      (2L, "image", gradientPng(tweak = true, invert = false)),
      (3L, "image", gradientPng(tweak = false, invert = true)),
      (4L, "image", "undecodable".getBytes("UTF-8")), // drops out pre-join
      (5L, "audio", gradientPng(tweak = false, invert = false))) // wrong kind
      .toDF("doc_id", "kind", "payload")
    val out = Multimodal.imageNearDups(rows, maxHamming = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  /** A 6x4 C420 Y4M clip whose per-frame luma is 8·(frame+1). */
  private def y4mClip(frames: Int, w: Int = 6, h: Int = 4): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    for (f <- 0 until frames) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      val y = Array.fill(w * h)((8 * (f + 1)).toByte)
      val c = Array.fill(((w + 1) / 2) * ((h + 1) / 2))(128.toByte)
      out.write(y); out.write(c); out.write(c)
    }
    out.toByteArray
  }

  test("video branch decodes a real Y4M clip: dimensions and frame count " +
       "round-trip, features are the temporal luma envelope") {
    val clip = y4mClip(frames = 16)
    val out = Multimodal.decode(
      Seq((7L, "video", clip)).toDF("doc_id", "kind", "payload")).head()
    assert(out.width == 6 && out.height == 4 && out.n_frames == 16)
    assert(out.byte_len == clip.length)
    // luma rises 8/255 per frame -> the 8-segment envelope is strictly
    // increasing, and segment 0 averages frames 0-1 = (8+16)/2/255
    val env = out.features.toSeq
    assert(env.zip(env.tail).forall { case (a, b) => a < b }, env)
    assert(math.abs(env.head - 12f / 255f) < 1e-4f)
    assert(math.abs(env.last - (8 * 15.5f) / 255f) < 1e-4f)
    // frame sampling now walks REAL frame indices
    val idx = Multimodal.sampleFrames(Multimodal.decode(
        Seq((7L, "video", clip)).toDF("doc_id", "kind", "payload")), stride = 5)
      .select("frame_idx").as[Int].collect().toSeq.sorted
    assert(idx == Seq(0, 5, 10, 15))
  }

  test("resamplePayloads halves a sine's frame count at half rate, keeps its " +
       "energy, and passes non-audio through byte-identical") {
    // 0.1 s of a 440 Hz sine at 8 kHz, 16-bit mono WAV
    val srcRate = 8000
    val n = 800
    val pcm = new Array[Byte](n * 2)
    for (f <- 0 until n) {
      val s = math.round(math.sin(2 * math.Pi * 440 * f / srcRate) * 20000).toInt
      pcm(2 * f) = (s & 0xFF).toByte
      pcm(2 * f + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(srcRate.toFloat, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val out = Multimodal.resamplePayloads(
      Seq((1L, "audio", wav), (2L, "audio", "noise".getBytes("UTF-8")),
        (3L, "image", wav)).toDF("doc_id", "kind", "payload"), targetHz = 4000)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("payload"), r.getInt(3), r.getLong(4), r.getBoolean(5))).toMap

    val (resampled, rate, frames, flag) = out(1L)
    assert((rate, frames, flag) == ((4000, 400L, true)))
    // re-decode through the REAL audio path: reported rate/frames match,
    // and the RMS envelope survives the rate change (a 440 Hz tone is
    // far below the new 2 kHz Nyquist, so linear interp barely dents it)
    val dec = Multimodal.decode(
      Seq((1L, "audio", resampled)).toDF("doc_id", "kind", "payload")).head()
    assert(dec.width == 4000 && dec.n_frames == 400)
    val rms = dec.features.toSeq
    val expected = 20000.0 / 32768 / math.sqrt(2)
    assert(rms.forall(r => math.abs(r - expected) < 0.03), rms)
    // undecodable audio and non-audio kinds pass through untouched
    assert(out(2L)._1.sameElements("noise".getBytes("UTF-8")) && !out(2L)._4)
    assert(out(3L)._1.sameElements(wav) && !out(3L)._4)
    // already at the target rate: no re-encode, flag false, clock reported
    val same = Multimodal.resamplePayloads(
      Seq((4L, "audio", wav)).toDF("doc_id", "kind", "payload"), targetHz = 8000)
      .collect().head
    assert(same.getAs[Array[Byte]]("payload").sameElements(wav) &&
      !same.getBoolean(5) && same.getInt(3) == 8000 && same.getLong(4) == 800L)
  }

  test("resizePayloads really rescales pixels: dims fit the box, brightness " +
       "survives, non-images pass through byte-identical") {
    import java.awt.image.BufferedImage
    // 64x40 solid mid-gray PNG -> box 32x32 -> 32x20
    val img = new BufferedImage(64, 40, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(120, 120, 120)); g.fillRect(0, 0, 64, 40)
    g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val text = "not an image".getBytes("UTF-8")

    val out = Multimodal.resizePayloads(
      Seq((1L, "image", png), (2L, "image", text), (3L, "audio", png))
        .toDF("doc_id", "kind", "payload"), maxW = 32, maxH = 32)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("payload"), r.getInt(3), r.getInt(4), r.getBoolean(5))).toMap

    val (resizedBytes, w, h, flag) = out(1L)
    assert((w, h, flag) == ((32, 20, true)))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resizedBytes))
    assert(back.getWidth == 32 && back.getHeight == 20)
    val c = back.getRGB(16, 10)
    // bilinear scale of a solid image stays the same color
    assert(((c >> 16) & 0xFF) == 120 && ((c >> 8) & 0xFF) == 120 && (c & 0xFF) == 120)
    // undecodable image bytes and non-image kinds pass through untouched
    assert(out(2L)._1.sameElements(text) && !out(2L)._4)
    assert(out(3L)._1.sameElements(png) && !out(3L)._4) // kind gate, no decode
    // an image already inside the box is NOT re-encoded
    val small = Multimodal.resizePayloads(
      Seq((4L, "image", png)).toDF("doc_id", "kind", "payload"), 100, 100)
      .collect().head
    assert(small.getAs[Array[Byte]]("payload").sameElements(png) &&
      !small.getBoolean(5) && small.getInt(3) == 64)
  }

  /** Animated GIF via the JDK's own sequence writer: `frames` solid
    * grayscale frames of rising brightness (24 gray per frame).
    */
  private def gifClip(frames: Int, w: Int = 10, h: Int = 6): Array[Byte] = {
    import java.awt.image.BufferedImage
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until frames) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val gray = 24 * (f + 1)
      val g2 = img.createGraphics()
      g2.setColor(new java.awt.Color(gray, gray, gray))
      g2.fillRect(0, 0, w, h)
      g2.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  test("animated GIF routes through the real video path: frame count and " +
       "temporal luma envelope are real, frame sampling walks real indices") {
    val clip = gifClip(frames = 8)
    val out = Multimodal.decode(
      Seq((11L, "video", clip)).toDF("doc_id", "kind", "payload")).head()
    assert(out.width == 10 && out.height == 6 && out.n_frames == 8)
    // brightness rises 24 gray per frame → strictly increasing envelope,
    // one frame per segment: segment f ≈ 24·(f+1)/255 (GIF palette
    // quantization can nudge a level, hence the loose tolerance)
    val env = out.features.toSeq
    assert(env.zip(env.tail).forall { case (a, b) => a < b }, env)
    assert(math.abs(env.head - 24f / 255f) < 0.02f, env)
    assert(math.abs(env.last - 192f / 255f) < 0.02f, env)
    val idx = Multimodal.sampleFrames(Multimodal.decode(
        Seq((11L, "video", clip)).toDF("doc_id", "kind", "payload")), stride = 3)
      .select("frame_idx").as[Int].collect().toSeq.sorted
    assert(idx == Seq(0, 3, 6))
    // a single-frame GIF still decodes (frames = 1), not the stub
    val still = Multimodal.decode(
      Seq((12L, "video", gifClip(frames = 1))).toDF("doc_id", "kind", "payload")).head()
    assert(still.n_frames == 1 && still.width == 10)
  }

  test("non-Y4M video bytes fall back to the deterministic stub; a " +
       "truncated Y4M keeps its complete frames") {
    val stub = Multimodal.decode(
      Seq((8L, "video", "not a clip".getBytes("UTF-8")))
        .toDF("doc_id", "kind", "payload")).head()
    assert(stub.width >= 16 && stub.features.length == 8)
    val full = y4mClip(frames = 4)
    val cut = java.util.Arrays.copyOf(full, full.length - 7) // cuts frame 4
    val out = Multimodal.decode(
      Seq((9L, "video", cut)).toDF("doc_id", "kind", "payload")).head()
    assert(out.n_frames == 3 && out.width == 6)
  }

  test("image/video group shape: identical hashes collapse to ONE family " +
       "row; near edges join family reps") {
    // three byte-identical PNGs (one pHash family of 3), one jittered
    // near-dup of that pattern, one unrelated pattern
    // seed 5: jittered pHash distance 2 (seed 1's jitter hashes
    // IDENTICALLY and would fold doc 4 into the exact family)
    val img = Seq(
      (1L, "image", Multimodal.synthBlockPng(5L, jitter = false)),
      (2L, "image", Multimodal.synthBlockPng(5L, jitter = false)),
      (3L, "image", Multimodal.synthBlockPng(5L, jitter = false)),
      (4L, "image", Multimodal.synthBlockPng(5L, jitter = true)),
      (5L, "image", Multimodal.synthBlockPng(42L, jitter = false)))
    val gi = Multimodal.imageNearDupGroups(img.toDF("doc_id", "kind", "payload"))
      .as[(Long, Long, Int, Long, Long, Long)].collect().toSet
    assert(gi.contains((1L, 1L, 0, 3L, 3L, 3L)), gi)
    assert(gi.exists(t => t._1 == 1L && t._2 == 4L && t._3 > 0 &&
      t._4 == 3L && t._5 == 1L && t._6 == 3L), gi)
    assert(!gi.exists(t => t._1 == 5L || t._2 == 5L), gi)
    assert(gi.size == 2, gi)

    val vid = Seq(
      (1L, "video", Multimodal.synthY4m(5L, jitter = false)),
      (2L, "video", Multimodal.synthY4m(5L, jitter = false)),
      (3L, "video", Multimodal.synthY4m(9L, jitter = false)),
      (4L, "video", Multimodal.synthY4m(9L, jitter = true)),
      (5L, "video", Multimodal.synthY4m(77L, jitter = false)))
    val gv = Multimodal.videoNearDupGroups(vid.toDF("doc_id", "kind", "payload"))
      .as[(Long, Long, Int, Long, Long, Long)].collect().toSet
    // the identical pair collapses to one family; the jittered regrade
    // is a near edge on its family rep; the unrelated clip is absent
    assert(gv.contains((1L, 1L, 0, 2L, 2L, 1L)), gv)
    assert(gv.exists(t => t._1 == 3L && t._2 == 4L && t._3 > 0 && t._6 == 1L), gv)
    assert(!gv.exists(t => t._1 == 5L || t._2 == 5L), gv)
  }

  test("decoded_real marks the stub boundary: an H.264-magic payload is " +
       "false (stub features), real containers are true") {
    // H.264 Annex-B elementary stream: start code 00 00 00 01 + SPS NAL
    // (type 7). A perfectly real video whose CODEC the JDK lacks — must
    // surface as decoded_real = false, never as a measured decode.
    val h264 = Array[Byte](0, 0, 0, 1, 0x67, 0x42, 0x00, 0x1f,
      (0xda).toByte, 0x01, 0x40, 0x16, (0xec).toByte, 0x04, 0x40, 0x00)
    val rows = Multimodal.decode(
      Seq((1L, "video", h264),
          (2L, "video", y4mClip(frames = 2)),
          (3L, "image", Multimodal.synthBlockPng(7L, jitter = false)),
          (4L, "audio", Multimodal.synthToneWav(7L, pitch = 1.0)),
          (5L, "image", "just prose, not an image".getBytes("UTF-8")))
        .toDF("doc_id", "kind", "payload")).collect().sortBy(_.doc_id)
    assert(!rows(0).decoded_real, "H.264 must be flagged as stub-decoded")
    assert(rows(0).features.length == 8) // stub still produces plumbing-shaped output
    assert(rows(1).decoded_real && rows(2).decoded_real && rows(3).decoded_real)
    assert(!rows(4).decoded_real)
    // decodesReal is the same branch condition decode() used
    assert(!Multimodal.decodesReal("video", h264))
    assert(Multimodal.decodesReal("video", y4mClip(frames = 2)))
  }
}
