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

  test("decode runs on the real documents table end-to-end") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = Multimodal.decode(Multimodal.withPayload(docs)).count()
    assert(n == docs.count())
  }
}
