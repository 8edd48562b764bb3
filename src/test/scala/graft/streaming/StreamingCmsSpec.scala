package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.CmsAgg

/** Count-Min as a STREAMING aggregate — the live frequency monitor over
  * an unbounded key domain. State per group is depth·width longs
  * forever (no watermark needed); each micro-batch folds into the
  * stored counters, so the deterministic one-sided guarantee
  * (estimate ≥ true count) must hold against the union of all batches.
  */
class StreamingCmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val D = 4
  private val W = 64

  private def idxs(c: org.apache.spark.sql.Column) =
    array((0 until D).map(i => pmod(xxhash64(c, lit(i)), lit(W)).cast("int")): _*)

  private def estFor(sk: Seq[Long], key: String): Long = {
    // mirror of the SQL index expression, evaluated through Spark itself
    // so JVM- and SQL-side hashing cannot diverge in the assertion
    val row = spark.range(1).select(idxs(lit(key)).as("ix")).head()
    row.getSeq[Int](0).zipWithIndex.map { case (ix, i) => sk(i * W + ix) }.min
  }

  test("counter state accumulates across micro-batches; estimates never undercount") {
    val dir = Files.createTempDirectory("scms")
    val cms = udaf(new CmsAgg(D, W))
    val raw = spark.readStream.schema("source STRING, word STRING")
      .option("header", "true").csv(dir.toString)
    val agg = raw.groupBy("source").agg(cms(idxs(col("word"))).as("sk"))

    val q = agg.writeStream.format("memory").queryName("scms")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("scms-ck").toString)
      .start()
    try {
      Files.writeString(dir.resolve("b1.csv"),
        "source,word\n" +
          (1 to 9).map(_ => "a,hot").mkString("\n") + "\n" +
          (1 to 5).map(i => s"a,w$i").mkString("\n") + "\n")
      q.processAllAvailable()
      val sk1 = spark.table("scms").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap.apply("a")
      assert(sk1.length == D * W)
      assert(estFor(sk1, "hot") >= 9L)
      assert(sk1.sum == 14L * D) // every row of counters sums to N

      Files.writeString(dir.resolve("b2.csv"),
        "source,word\n" + (1 to 6).map(_ => "a,hot").mkString("\n") + "\n")
      q.processAllAvailable()
      val sk2 = spark.table("scms").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap.apply("a")
      assert(estFor(sk2, "hot") >= 15L, "state did not accumulate across batches")
      assert(sk2.sum == 20L * D)
      // a key never inserted can only read collision mass, bounded by
      // the second batch leaving w1..w5 untouched
      assert(estFor(sk2, "w1") >= 1L)
    } finally q.stop()
  }
}
