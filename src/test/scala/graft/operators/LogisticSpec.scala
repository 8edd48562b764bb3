package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The [[Logistic]] trainer on PLANTED linearly separable data: the
  * registered `linear_probe` query proves the distributed GD recurrence
  * is exact (oracle replay); this spec proves the recurrence LEARNS —
  * on a margin-separated plant the loss must fall monotonically with
  * the iteration budget and end near zero with every point classified.
  * (On the synthetic corpus labels the loss barely moves — a property
  * of that data, which is why the learning evidence lives here.)
  */
class LogisticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two clusters at (±2, ±2): margin ~2√2, trivially separable
  private lazy val feats = Seq(
    (1.0, 1.0, 2.0, 2.5), (1.0, 1.0, 2.5, 1.5), (1.0, 1.0, 1.5, 2.0),
    (1.0, 1.0, 2.2, 2.2), (0.0, 1.0, -2.0, -2.5), (0.0, 1.0, -2.5, -1.5),
    (0.0, 1.0, -1.5, -2.0), (0.0, 1.0, -2.2, -2.2)
  ).toDF("y", "x0", "x1", "x2")

  test("loss falls monotonically with iteration budget and ends near zero") {
    val losses = Seq(2, 10, 40).map { iters =>
      val w = Logistic.train(feats, 3, iters, lr = 2.0)
      Logistic.logLoss(feats, w).head().getDouble(0)
    }
    assert(losses == losses.sorted.reverse, losses)
    assert(losses.last < 0.05, losses)
  }

  test("every planted point is classified after training") {
    val w = Logistic.train(feats, 3, iters = 40, lr = 2.0)
    val miss = feats
      .filter((Logistic.prob(w) >= 0.5) =!= (col("y") === 1.0))
      .count()
    assert(miss == 0)
  }
}
