package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the association and recency audits: χ² is 0 under
  * planted independence and n·min(R−1,C−1) under perfect association
  * (V = 1), and decayed counts halve exactly per planted day.
  */
class Chi2DecaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-chi2").toString
    rows.toDF("doc_id", "lang", "source")
      .withColumn("text", lit("t")).withColumn("n_chars", lit(1L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("chi2_assoc: identical lang mix across sources → χ² = 0, V = 0") {
    val rows = for {
      (src, base) <- Seq(("s1", 0L), ("s2", 100L))
      i <- 0L until 4L
    } yield (base + i, if (i < 2) "en" else "fr", src)
    val got = ExperimentQueries.chi2Assoc(spark, docsDir(rows))
      .as[(Long, Long, Long, Long, Double, Double)].collect().toList
    assert(got == List((8L, 2L, 2L, 1L, 0.0, 0.0)))
  }

  test("chi2_assoc: perfectly confounded lang/source → χ² = n, V = 1") {
    val rows = (0L until 4L).map(i => (i, "en", "s1")) ++
      (4L until 8L).map(i => (i, "fr", "s2"))
    val got = ExperimentQueries.chi2Assoc(spark, docsDir(rows))
      .as[(Long, Long, Long, Long, Double, Double)].collect().toList
    assert(got == List((8L, 2L, 2L, 1L, 8.0, 1.0)))
  }

  test("decay_counts: weights halve per day exactly; the weekly " +
       "half-life groups days into buckets of 7") {
    val dir = java.nio.file.Files.createTempDirectory("graft-decay").toString
    val day = 86400L * 1000000000L // ns
    // type a: 2 events on the max day, 4 events the day before
    // type b: 1 event 7 days before max (d1 weight 2^-7, w1 weight 0.5)
    val rows =
      (1 to 2).map(i => (i.toLong, 8 * day + i, 1L, "a")) ++
      (3 to 6).map(i => (i.toLong, 7 * day + i, 1L, "a")) ++
      Seq((7L, 1 * day + 7, 1L, "b"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SignalQueries.decayCounts(spark, dir)
      .as[(String, Long, Double, Double)].collect().toList
    assert(got == List(
      ("a", 6L, 2.0 + 4 * 0.5, 6.0),
      ("b", 1L, 0.0078, 0.5))) // 2⁻⁷ under the 4-decimal display round
  }
}
