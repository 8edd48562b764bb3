package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DeAccent, DotProduct}

/** Session wiring for the engine's custom Catalyst expressions, so SQL
  * users get them by name:
  *
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build, or
  *   - [[Graft.register]] on an already-running session.
  *
  * Only `deaccent` and `dot_product` exist as custom expressions — every
  * other operator composes from Spark built-ins by design (SURVEY.md §7.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Graft.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))
    }
    ext.injectOptimizerRule(graft.plans.CollapseDeAccent)
  }
}

object Graft {

  /** Wrong arity surfaces as the standard WRONG_NUM_ARGS analysis error
    * (like any built-in), not a NoSuchElementException from blind
    * indexing.
    */
  private def arity(name: String, expected: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs =>
      if (exprs.length == expected) build(exprs)
      else throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map("functionName" -> s"`$name`", "expectedNum" -> expected.toString,
          "actualNum" -> exprs.length.toString, "docroot" -> "https://spark.apache.org/docs/latest"))

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("deaccent", "deaccent(str) - NFKD-decompose and strip combining marks",
      arity("deaccent", 1)(exprs => DeAccent(exprs.head))),
    ("dot_product", "dot_product(a, b) - fused dot product of two numeric arrays",
      arity("dot_product", 2)(exprs => DotProduct(exprs(0), exprs(1)))))

  /** Register the custom functions on a live session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
