package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Property coverage for the lane-packed simhash aggregation: on
  * arbitrary token lists (including empty docs, single tokens, heavy
  * repetition and exact-tie vote counts) the packed 16-accumulator
  * grouped form must equal the independent row-local ±1-vote fold
  * ([[Dedup.simhash64]]) bit for bit.
  */
object SimhashProps extends Properties("Simhash") {

  private lazy val spark = TestSpark.spark

  private val token: Gen[String] =
    Gen.oneOf(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(6)),
      Gen.oneOf("the", "spam", "fox", "über", "tok1", "tok2"))

  private val docSets: Gen[List[List[String]]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(token)).map(_.take(8))

  property("packed grouped simhash == row-local ±1-vote simhash") =
    Prop.forAllNoShrink(docSets) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val packed = Dedup.simhashSignatures(df, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      val rowLocal = df.select(col("doc_id"),
          Dedup.simhash64(TextAnalysis.wordTokens(col("text"))).as("sim"))
        .as[(Long, Long)].collect().toMap
      (packed == rowLocal) :| s"packed=$packed rowLocal=$rowLocal"
    }
}
