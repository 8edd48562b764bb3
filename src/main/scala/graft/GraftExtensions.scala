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
  * Only `deaccent`, `dot_product`, `ngram_hash` and the deflate pair
  * exist as custom expressions — every other operator composes from
  * Spark built-ins by design (SURVEY.md §7.3).
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
      arity("dot_product", 2)(exprs => DotProduct(exprs(0), exprs(1)))),
    ("ngram_hash", "ngram_hash(tokens, start, n) - fused xxhash64 of the n-token slice at start (0-based)",
      arity("ngram_hash", 3)(exprs => {
        // n parameterizes the generated code, so it must be a compile-time
        // constant: any foldable int expression qualifies
        val nExpr = exprs(2)
        val n = if (nExpr.foldable) nExpr.eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"ngram_hash: n must be an INT literal, got $other")
        } else throw new IllegalArgumentException(
          "ngram_hash: n must be a foldable INT literal")
        graft.functions.NgramHash(exprs(0), exprs(1), n)
      })),
    ("ngram_distinct", "ngram_distinct(tokens, n) - fused distinct n-gram count over the token array (tail grams shorten)",
      arity("ngram_distinct", 2)(exprs => {
        val nExpr = exprs(1)
        val n = if (nExpr.foldable) nExpr.eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"ngram_distinct: n must be an INT literal, got $other")
        } else throw new IllegalArgumentException(
          "ngram_distinct: n must be a foldable INT literal")
        graft.functions.NgramDistinct(exprs(0), n)
      })),
    ("deflate_ratio", "deflate_ratio(str) - zlib compressibility ratio of the UTF-8 bytes (lower = more redundant)",
      arity("deflate_ratio", 1)(exprs => graft.functions.DeflateRatio(exprs.head))),
    ("deflate_len", "deflate_len(str) - deflated byte count of the UTF-8 bytes",
      arity("deflate_len", 1)(exprs => graft.functions.DeflateLen(exprs.head))))

  /** Register the custom functions on a live session's registry —
    * scalar expressions plus the typed aggregator surface
    * (`weighted_mean(value, weight)`).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    spark.udf.register("weighted_mean",
      org.apache.spark.sql.functions.udaf(graft.functions.WeightedMean))
  }
}
