package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** transformWithState semantics of the streaming quota: budgets carry
  * across micro-batches, admission stops exactly at the cap, and
  * sources are independent.
  */
class StreamingQuotaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-source budget is enforced across micro-batches; sources are independent") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = Files.createTempDirectory("quota")
    val raw = spark.readStream.schema("source STRING, doc_id LONG, n_tokens LONG")
      .option("header", "true").csv(dir.toString)
    val out = StreamingQuota(raw.as[DocIn], budgetPerSource = 100L)
    val query = out.writeStream.format("memory").queryName("quota")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("qck").toString)
      .start()
    try {
      // batch 1: src A uses 70 of 100; src B uses 90
      Files.writeString(dir.resolve("b1.csv"),
        "source,doc_id,n_tokens\nA,1,40\nA,2,30\nB,3,90\n")
      query.processAllAvailable()
      val t1 = spark.table("quota").as[AdmitOut].collect().toSet
      assert(t1 == Set(AdmitOut("A", 1, 40, 40), AdmitOut("A", 2, 30, 70),
        AdmitOut("B", 3, 90, 90)))

      // batch 2: A's 40 would cross (70+40>100) -> dropped, but the later
      // (by doc_id) 30 fits exactly; B's 20 crosses -> dropped
      Files.writeString(dir.resolve("b2.csv"),
        "source,doc_id,n_tokens\nA,4,40\nA,5,30\nB,6,20\n")
      query.processAllAvailable()
      val t2 = spark.table("quota").as[AdmitOut].collect().toSet
      assert(t2 == t1 + AdmitOut("A", 5, 30, 100))

      // batch 3: A is exactly at the cap -> dropped; B still has 10 left
      Files.writeString(dir.resolve("b3.csv"),
        "source,doc_id,n_tokens\nA,7,1\nB,8,1\n")
      query.processAllAvailable()
      val t3 = spark.table("quota").as[AdmitOut].collect().toSet
      assert(t3 == t2 + AdmitOut("B", 8, 1, 91))

      // batch 4: nothing fits anywhere -> nothing admitted
      Files.writeString(dir.resolve("b4.csv"),
        "source,doc_id,n_tokens\nA,9,1\nB,10,10\n")
      query.processAllAvailable()
      assert(spark.table("quota").count() == t3.size)
    } finally {
      query.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
