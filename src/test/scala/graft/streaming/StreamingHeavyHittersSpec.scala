package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.HeavyHittersAgg

/** Misra-Gries as a STREAMING aggregate — the live trending-keys
  * monitor. The state store exercises exactly the mergeable-summaries
  * law the batch property test proves: each micro-batch folds into the
  * stored counter map, state stays ≤ capacity counters per group
  * forever (no watermark needed for boundedness), and a key that keeps
  * arriving must dominate the summary while one-off keys wash out.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("trending keys persist across micro-batches; state stays capacity-bounded") {
    val dir = Files.createTempDirectory("shh")
    val hh = udaf(new HeavyHittersAgg(4))
    val raw = spark.readStream.schema("source STRING, word STRING")
      .option("header", "true").csv(dir.toString)
    val agg = raw.groupBy("source")
      .agg(hh(col("word")).as("hh"))
      .select(col("source"), col("hh.keys").as("keys"), col("hh.counts").as("counts"))

    val q = agg.writeStream.format("memory").queryName("shh")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("shh-ck").toString)
      .start()
    try {
      // batch 1: "hot" appears 10×, plus 8 one-off keys (over capacity 4)
      Files.writeString(dir.resolve("b1.csv"),
        "source,word\n" +
          (1 to 10).map(_ => "a,hot").mkString("\n") + "\n" +
          (1 to 8).map(i => s"a,rare$i").mkString("\n") + "\n")
      q.processAllAvailable()
      val after1 = spark.table("shh").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).zip(r.getSeq[Long](2))).toMap
      val a1 = after1("a")
      assert(a1.length <= 4, s"state over capacity: $a1")
      assert(a1.head._1 == "hot", s"hot not dominant after b1: $a1")
      // MG undercount bound: n=18, c=4 → count("hot") ≥ 10 − 18/5
      assert(a1.head._2 >= 10L - 18L / 5, s"hot undercounted past bound: $a1")

      // batch 2: "hot" keeps trending (6 more), "surge" bursts 7×,
      // another 6 one-offs try to crowd the summary
      Files.writeString(dir.resolve("b2.csv"),
        "source,word\n" +
          (1 to 6).map(_ => "a,hot").mkString("\n") + "\n" +
          (1 to 7).map(_ => "a,surge").mkString("\n") + "\n" +
          (1 to 6).map(i => s"a,noise$i").mkString("\n") + "\n")
      q.processAllAvailable()
      val a2 = spark.table("shh").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).zip(r.getSeq[Long](2))).toMap
        .apply("a")
      assert(a2.length <= 4, s"state over capacity: $a2")
      val keys = a2.map(_._1).toSet
      // n=37 total, threshold n/(c+1)=7.4: hot (16) must survive; surge
      // (7) sits at the bound and one-off noise must not displace hot
      assert(keys.contains("hot"), s"hot lost after b2: $a2")
      assert(a2.map(_._1).head == "hot", s"hot not dominant after b2: $a2")
      assert(!keys.exists(_.startsWith("rare")) || a2.length <= 4)
    } finally q.stop()
  }
}
