package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Online semantics of the streaming near-dup admission filter:
  * near-copies are dropped within and across micro-batches, distinct
  * docs pass, blocks are independent, and FIFO eviction re-admits an
  * evicted fingerprint's copy (the bounded-state recall contract).
  */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val base = "the quick brown fox jumps over the lazy dog " * 8
  // one token INSTANCE changed out of 72 — a genuine near-copy whose
  // fingerprint stays within a few bits of the original
  private val nearCopy = base.replaceFirst("lazy", "idle")
  private val distinct1 = "completely different text about spark catalyst " +
    "optimizer rules and shuffle partitioning strategies " * 6
  private val distinct2 = "yet another unrelated document discussing minhash " +
    "signatures banded locality sensitive hashing buckets " * 6

  private def csvLine(source: String, id: Long, text: String): String =
    s"""$source,$id,"${text.trim}"\n"""

  test("near-copies dropped across micro-batches; distinct docs admitted; " +
       "blocks independent; FIFO eviction re-admits") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = Files.createTempDirectory("neardup")
    val raw = spark.readStream.schema("source STRING, doc_id LONG, text STRING")
      .csv(dir.toString)
    val out = StreamingNearDup(raw.toDF(), maxHamming = 3, ringCapacity = 2)
    val query = out.writeStream.format("memory").queryName("neardup")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ndck").toString)
      .start()
    try {
      // batch 1: original admitted; same-batch near-copy dropped; the
      // same text in ANOTHER block is admitted (blocks independent)
      Files.writeString(dir.resolve("b1.csv"),
        csvLine("web", 1, base) + csvLine("web", 2, nearCopy) +
          csvLine("books", 3, base))
      query.processAllAvailable()
      val t1 = spark.table("neardup").as[NearDupOut].collect()
        .map(r => r.doc_id -> r.admitted).toMap
      assert(t1 == Map(1L -> true, 2L -> false, 3L -> true))

      // batch 2: a LATER near-copy in web still dropped (state carried
      // across batches); a distinct doc admitted
      Files.writeString(dir.resolve("b2.csv"),
        csvLine("web", 4, nearCopy) + csvLine("web", 5, distinct1))
      query.processAllAvailable()
      val t2 = spark.table("neardup").as[NearDupOut].collect()
        .map(r => r.doc_id -> r.admitted).toMap
      assert(t2(4L) == false && t2(5L) == true)

      // batch 3: one more distinct admission evicts base's fingerprint
      // from the capacity-2 ring (ring now holds distinct1, distinct2)...
      Files.writeString(dir.resolve("b3.csv"), csvLine("web", 6, distinct2))
      query.processAllAvailable()
      // ...so batch 4's near-copy of base is RE-ADMITTED — the
      // documented bounded-state recall tradeoff
      Files.writeString(dir.resolve("b4.csv"), csvLine("web", 7, nearCopy))
      query.processAllAvailable()
      val t4 = spark.table("neardup").as[NearDupOut].collect()
        .map(r => r.doc_id -> r.admitted).toMap
      assert(t4(6L) == true)
      assert(t4(7L) == true, "evicted fingerprint must no longer block")

      // dropped rows carry the evidence: doc 2's min hamming is <= 3
      val h2 = spark.table("neardup").as[NearDupOut].collect()
        .find(_.doc_id == 2L).get.min_hamming
      assert(h2 <= 3)
    } finally {
      query.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("fingerprint ring survives a query RESTART from the checkpoint: a " +
       "copy of a pre-restart admission is still dropped") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = Files.createTempDirectory("neardup2")
    val ck = Files.createTempDirectory("ndck2").toString
    val out = Files.createTempDirectory("ndout2").toString

    // parquet sink: the memory sink refuses checkpoint recovery
    def runOnce(): Unit = {
      val raw = spark.readStream.schema("source STRING, doc_id LONG, text STRING")
        .csv(dir.toString)
      val q = StreamingNearDup(raw.toDF(), maxHamming = 3, ringCapacity = 1024)
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    try {
      Files.writeString(dir.resolve("b1.csv"), csvLine("web", 1, base))
      runOnce() // first query instance admits the original, then DIES

      Files.writeString(dir.resolve("b2.csv"),
        csvLine("web", 2, nearCopy) + csvLine("web", 3, distinct1))
      runOnce() // NEW query instance, same checkpoint
      val admitted = spark.read.parquet(out).as[NearDupOut].collect()
        .map(r => r.doc_id -> r.admitted).toMap
      // a reset ring would re-admit doc 2; recovery means it is dropped
      assert(admitted == Map(1L -> true, 2L -> false, 3L -> true))
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
