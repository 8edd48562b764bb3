package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Row-local distinct n-gram count, fused: one kernel call per ROW.
  *
  * The composable form — `size(array_distinct(transform(sequence(...),
  * i -> ngram_hash(t, i, n))))` — pays Spark's interpreted
  * higher-order-function dispatch per ELEMENT (HOFs are
  * CodegenFallback): measured 2.2 s for the corpus-wide repetition gate
  * at sf0.1, where this kernel's single sorted-array pass is ~0.15 s —
  * and unlike the explode+window rewrite of the same computation
  * (0.5 s), it shuffles NOTHING: the repetition signal stays a pure
  * map-side projection at any corpus size. Gram identity is the same
  * chained xxhash64 as [[NgramHash]], so distinct counts equal the
  * distinct-gram-string counts the oracles compute (modulo ~1e-15
  * 64-bit collisions, the tolerance every hashed-gram pipeline here
  * already accepts).
  */
object NgramDistinctKernels {

  def ngramDistinctCol(tokens: Column, n: Int): Column =
    GraftShim.column(NgramDistinct(GraftShim.expression(tokens), n))

  /** JVM kernel shared by interpreted eval and generated code: hash
    * every position's n-gram (tail grams shorten like `concat_ws`, the
    * [[NgramKernels.hash]] contract), then count distinct via one
    * sort — O(k log k), one allocation, zero boxing.
    */
  def distinctGrams(arr: ArrayData, n: Int): Long = {
    val len = arr.numElements()
    val k = math.max(len - n, 0) + 1
    val hs = new Array[Long](k)
    var i = 0
    while (i < k) { hs(i) = NgramKernels.hash(arr, i, n); i += 1 }
    java.util.Arrays.sort(hs)
    var d = 1L
    var j = 1
    while (j < k) { if (hs(j) != hs(j - 1)) d += 1; j += 1 }
    d
  }
}

case class NgramDistinct(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"ngram_distinct requires array<string> and n > 0, got " +
        s"${child.dataType.catalogString}, n=$n")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_distinct"

  override protected def nullSafeEval(arr: Any): Any =
    NgramDistinctKernels.distinctGrams(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr =>
      s"${NgramDistinctKernels.getClass.getName.stripSuffix("$")}" +
        s".distinctGrams($arr, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramDistinct =
    copy(child = newChild)
}
