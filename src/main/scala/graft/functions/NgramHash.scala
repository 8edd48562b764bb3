package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Codegen'd n-gram hashing straight off a token array.
  *
  * The composable form — `xxhash64(concat_ws(" ", get(t,i), get(t,i+1),
  * …))` — materializes every gram as a NEW string (copy the n tokens +
  * separators into a fresh buffer) only to hash-and-discard it. This
  * expression chains xxhash64 over the n token byte-slices in place:
  * zero copies, zero allocations, one fused loop. Measured A/B at sf0.1
  * the two are at PARITY — the dedup pipelines are shuffle-bound there —
  * so the win is the ~2M fewer transient allocations per scan (executor
  * GC pressure at real scale), not local wall-clock. Hash values differ
  * from the string form (chaining, not concatenation) but are used only
  * engine-internally as set-membership keys, where any collision-
  * resistant 64-bit identity is equivalent (oracle-visible grams —
  * winnowing, decontamination — stay on engine-portable md5 strings).
  *
  * Token boundaries feed the chain (each token hashed as its own block
  * with the running value as seed), so ("ab","c") and ("a","bc") hash
  * differently — same discrimination concat-with-separator gives.
  * Out-of-range positions are skipped, matching `concat_ws`'s
  * null-dropping for grams at the tail of short documents.
  */
object NgramKernels {

  val Seed = 42L

  def ngramHashCol(tokens: Column, start: Column, n: Int): Column =
    GraftShim.column(
      NgramHash(GraftShim.expression(tokens), GraftShim.expression(start), n))

  /** JVM kernel shared by interpreted eval and generated code. */
  def hash(arr: ArrayData, start: Int, n: Int): Long = {
    var h = Seed
    val len = arr.numElements()
    var j = 0
    while (j < n) {
      val idx = start + j
      if (idx >= 0 && idx < len && !arr.isNullAt(idx)) {
        val s = arr.getUTF8String(idx)
        h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, h)
      }
      j += 1
    }
    h
  }
}

case class NgramHash(left: Expression, right: Expression, n: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"ngram_hash requires (array<string>, int) and n > 0, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}, n=$n")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_hash"

  override protected def nullSafeEval(arr: Any, start: Any): Any =
    NgramKernels.hash(arr.asInstanceOf[ArrayData], start.asInstanceOf[Int], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, start) => {
      val h   = ctx.freshName("h")
      val len = ctx.freshName("len")
      val j   = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val s   = ctx.freshName("s")
      val xxh = classOf[XXH64].getName
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |long $h = ${NgramKernels.Seed}L;
         |final int $len = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  final int $idx = $start + $j;
         |  if ($idx >= 0 && $idx < $len && !$arr.isNullAt($idx)) {
         |    final $utf8 $s = $arr.getUTF8String($idx);
         |    $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), $h);
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NgramHash =
    copy(left = newLeft, right = newRight)
}
