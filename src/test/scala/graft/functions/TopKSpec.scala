package graft.functions

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaAgg(rows: Seq[(String, Double, Long)], k: Int): Set[(String, Double, Long)] = {
    val topk = udaf(new TopKAgg(k), Encoders.product[Scored])
    rows.toDF("g", "score", "id").repartition(7)
      .groupBy("g").agg(topk(col("score"), col("id")).as("t"))
      .select(col("g"), explode(arrays_zip(col("t.scores").as("s"), col("t.ids").as("i"))).as("x"))
      .select(col("g"), col("x.s"), col("x.i"))
      .as[(String, Double, Long)].collect().toSet
  }

  private def viaWindow(rows: Seq[(String, Double, Long)], k: Int): Set[(String, Double, Long)] = {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    rows.toDF("g", "score", "id")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("g"), col("score"), col("id"))
      .as[(String, Double, Long)].collect().toSet
  }

  test("matches the window-rank ground truth on a deterministic corpus") {
    val rows = for (i <- 0L until 500L) yield
      (s"g${i % 7}", ((i * 37) % 101).toDouble, i)
    assert(viaAgg(rows, 5) == viaWindow(rows, 5))
  }

  test("score ties resolve to the smallest id") {
    val rows = Seq(("g", 1.0, 30L), ("g", 1.0, 10L), ("g", 1.0, 20L), ("g", 0.5, 1L))
    assert(viaAgg(rows, 2) == Set(("g", 1.0, 10L), ("g", 1.0, 20L)))
  }

  test("groups smaller than k return all their rows") {
    val rows = Seq(("g", 2.0, 1L), ("g", 1.0, 2L))
    assert(viaAgg(rows, 5) == rows.toSet)
  }

  test("merge order does not matter: result is stable across partitionings") {
    val rows = for (i <- 0L until 300L) yield ("g", (i % 13).toDouble, i)
    val expected = viaAgg(rows, 4)
    for (parts <- Seq(1, 3, 17)) {
      val topk = udaf(new TopKAgg(4), Encoders.product[Scored])
      val got = rows.toDF("g", "score", "id").repartition(parts)
        .groupBy("g").agg(topk(col("score"), col("id")).as("t"))
        .select(explode(arrays_zip(col("t.scores").as("s"), col("t.ids").as("i"))).as("x"))
        .select(lit("g"), col("x.s"), col("x.i"))
        .as[(String, Double, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("partial aggregation happens before the shuffle (bounded shuffle rows)") {
    val topk = udaf(new TopKAgg(3), Encoders.product[Scored])
    val plan = (0L until 100L).map(i => ("g", i.toDouble, i)).toDF("g", "score", "id")
      .groupBy("g").agg(topk(col("score"), col("id")))
      .queryExecution.executedPlan.toString
    // two-phase ObjectHashAggregate around the exchange = map-side combine
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
