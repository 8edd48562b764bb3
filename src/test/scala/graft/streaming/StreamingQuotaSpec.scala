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

  test("ValueState survives a query RESTART from the checkpoint: the budget " +
       "spent before the stop still counts after") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = Files.createTempDirectory("quota2")
    val ck = Files.createTempDirectory("qck2").toString
    val out = Files.createTempDirectory("qout2").toString

    // parquet sink: the memory sink refuses checkpoint recovery
    def runOnce(): Unit = {
      val raw = spark.readStream.schema("source STRING, doc_id LONG, n_tokens LONG")
        .option("header", "true").csv(dir.toString)
      val q = StreamingQuota(raw.as[DocIn], budgetPerSource = 100L)
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    try {
      Files.writeString(dir.resolve("b1.csv"), "source,doc_id,n_tokens\nA,1,90\n")
      runOnce() // first query instance: A spends 90/100, then the query DIES

      Files.writeString(dir.resolve("b2.csv"),
        "source,doc_id,n_tokens\nA,2,20\nA,3,10\n")
      runOnce() // NEW query instance, same checkpoint
      val rows = spark.read.parquet(out).as[AdmitOut].collect().toSet
      // if state had reset, doc 2 (20) would fit; recovery means only
      // doc 3 (10) fits against the remembered 90
      assert(rows == Set(AdmitOut("A", 1, 90, 90), AdmitOut("A", 3, 10, 100)))
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
