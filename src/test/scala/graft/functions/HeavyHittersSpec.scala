package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Skewed corpus: "hot" = 40% of rows, "warm" = 20%, the rest spread
    * over many cold keys.
    */
  private val n = 2000
  private val rows: Seq[String] =
    Seq.fill(n * 2 / 5)("hot") ++ Seq.fill(n / 5)("warm") ++
      (0 until n * 2 / 5).map(i => s"cold${i % 200}")

  private def sketch(parts: Int, capacity: Int): HeavyHitters = {
    val hh = udaf(new HeavyHittersAgg(capacity), Encoders.STRING)
    rows.toDF("k").repartition(parts)
      .agg(hh(col("k")).as("h"))
      .select(col("h.keys"), col("h.counts"))
      .as[(Seq[String], Seq[Long])].head() match {
      case (ks, cs) => HeavyHitters(ks, cs)
    }
  }

  test("every key above the n/(c+1) frequency guarantee survives") {
    for (parts <- Seq(1, 8)) {
      val got = sketch(parts, capacity = 8)
      // hot (800) and warm (400) both exceed 2000/9 ≈ 222
      assert(got.keys.contains("hot"), s"parts=$parts: $got")
      assert(got.keys.contains("warm"), s"parts=$parts: $got")
      assert(got.keys.length <= 8)
    }
  }

  test("reported counts are lower bounds within n/(c+1) of the truth") {
    val got = sketch(parts = 8, capacity = 8)
    val err = n / 9 + 1
    val truth = Map("hot" -> 800L, "warm" -> 400L)
    truth.foreach { case (k, exact) =>
      val est = got.counts(got.keys.indexOf(k))
      assert(est <= exact, s"$k overcounted: $est > $exact")
      assert(exact - est <= err, s"$k undercount ${exact - est} beyond bound $err")
    }
  }

  test("heavy hitters rank ahead of noise keys") {
    val got = sketch(parts = 4, capacity = 8)
    assert(got.keys.take(2).toSet == Set("hot", "warm"))
    assert(got.counts.zip(got.counts.drop(1)).forall { case (a, b) => a >= b })
  }
}
