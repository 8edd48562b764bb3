package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Multimodal

/** Online semantics of the streaming MEDIA admission gate: a regraded
  * replay of an already-admitted clip is dropped within and across
  * micro-batches and across KINDS independently (an image and a video
  * never collide — different fingerprint spaces, same 64-bit
  * operator), distinct clips pass, and undecodable payloads drop out
  * of the stream without failing it.
  */
class StreamingMediaDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def row(src: String, id: Long, kind: String, p: Array[Byte]) =
    (src, id, kind, p)

  test("regraded replays dropped across batches; kinds and blocks independent; junk dropped") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = Files.createTempDirectory("mediadedup")
    val schema = "source STRING, doc_id LONG, kind STRING, payload BINARY"
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    val out = StreamingMediaDedup(raw.toDF(), maxHamming = 3, ringCapacity = 64)
    val query = out.writeStream.format("memory").queryName("mediadedup")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("mdck").toString)
      .start()
    try {
      // batch 1: an image + its SAME-BATCH regrade; a video in the
      // same source (kinds block independently BY CONSTRUCTION — the
      // web/video ring never sees web/image fingerprints); junk
      Seq(
        row("web", 1, "image", Multimodal.synthBlockPng(7L, jitter = false)),
        row("web", 2, "image", Multimodal.synthBlockPng(7L, jitter = true)),
        row("web", 3, "video", Multimodal.synthY4m(7L, jitter = false)),
        row("web", 4, "image", "junk".getBytes("UTF-8")))
        .toDF("source", "doc_id", "kind", "payload")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      query.processAllAvailable()
      val t1 = spark.table("mediadedup").as[NearDupOut].collect()
        .map(r => r.doc_id -> r.admitted).toMap
      assert(t1 == Map(1L -> true, 2L -> false, 3L -> true),
        s"got $t1 (junk row 4 must not appear at all)")

      // batch 2: a LATER regrade of the admitted video dropped (state
      // across batches); a distinct image admitted; another block is
      // independent state
      Seq(
        row("web", 5, "video", Multimodal.synthY4m(7L, jitter = true)),
        row("web", 6, "image", Multimodal.synthBlockPng(9L, jitter = false)),
        row("books", 7, "image", Multimodal.synthBlockPng(7L, jitter = false)))
        .toDF("source", "doc_id", "kind", "payload")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      query.processAllAvailable()
      val t2 = spark.table("mediadedup").as[NearDupOut].collect()
        .map(r => r.doc_id -> r.admitted).toMap
      assert(t2(5L) == false && t2(6L) == true && t2(7L) == true, s"got $t2")
    } finally query.stop()
  }
}
