package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.KmvAgg

/** KMV sketch as a STREAMING aggregate: the mergeable-summaries law is
  * exactly what the state store exercises — each micro-batch folds new
  * rows into the stored buffer (reduce) and merges partials (merge), so
  * the per-source sketch after N batches must equal the sketch of all N
  * batches' union. Below capacity that equality is testable exactly:
  * retained-set size == true distinct count. This is the bounded-memory
  * streaming distinct/overlap monitor: state per source is ≤ k longs
  * forever, no watermark needed for boundedness.
  */
class StreamingKmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-source sketch state merges across micro-batches; capacity bounds state") {
    val dir = Files.createTempDirectory("skmv")
    val kmv = udaf(new KmvAgg(64))
    val raw = spark.readStream.schema("source STRING, item LONG")
      .option("header", "true").csv(dir.toString)
    val agg = raw.groupBy("source")
      .agg(kmv(col("item")).as("sk"))
      .select(col("source"), size(col("sk.vals")).as("nd"), col("sk.full").as("full"))

    val q = agg.writeStream.format("memory").queryName("skmv")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("skmv-ck").toString)
      .start()
    try {
      // batch 1: a has {1..8} (with dups), b has {100..104}
      Files.writeString(dir.resolve("b1.csv"),
        "source,item\n" +
          (1 to 8).map(i => s"a,$i").mkString("\n") + "\n" +
          (1 to 8).map(i => s"a,$i").mkString("\n") + "\n" +
          (100 to 104).map(i => s"b,$i").mkString("\n") + "\n")
      q.processAllAvailable()
      val after1 = spark.table("skmv").collect()
        .map(r => r.getString(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
      assert(after1("a") == ((8, false)), s"a after b1: ${after1("a")}")
      assert(after1("b") == ((5, false)))

      // batch 2: a overlaps {5..12} (4 new), b gets 200 distinct → full
      Files.writeString(dir.resolve("b2.csv"),
        "source,item\n" +
          (5 to 12).map(i => s"a,$i").mkString("\n") + "\n" +
          (1000 until 1200).map(i => s"b,$i").mkString("\n") + "\n")
      q.processAllAvailable()
      val after2 = spark.table("skmv").collect()
        .map(r => r.getString(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
      assert(after2("a") == ((12, false)), s"a after b2: ${after2("a")}")
      assert(after2("b") == ((64, true)), s"b after b2: ${after2("b")}")
    } finally q.stop()
  }
}
