package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent (combining-mark) stripping, the one scalar function in the
  * reference surface with no Spark built-in.
  *
  * Semantics (reference `app.py:169-173`): NFKD-decompose the string and
  * drop every character with a non-zero canonical combining class —
  * exactly Python's `unicodedata.combining(c) != 0` test. ICU's
  * `getCombiningClass` gives the same ccc values, so `á→a`, `ñ→n`,
  * `ü→u` and ASCII is a fixpoint.
  */
object Accent {

  /** JVM-side kernel shared by interpreted eval and generated code. */
  def strip(s: String): String = {
    val nfkd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
    var i = 0
    var changed = false
    val sb = new java.lang.StringBuilder(nfkd.length)
    while (i < nfkd.length) {
      val cp = nfkd.codePointAt(i)
      if (com.ibm.icu.lang.UCharacter.getCombiningClass(cp) == 0) sb.appendCodePoint(cp)
      else changed = true
      i += java.lang.Character.charCount(cp)
    }
    if (changed || (nfkd ne s)) sb.toString else s
  }

  /** UTF8String bridge used by codegen (avoids an extra dispatch). */
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = strip(str)
    if (out eq str) s else UTF8String.fromString(out)
  }

  /** Column API: `deaccent($"name")`. */
  def deaccent(c: Column): Column =
    GraftShim.column(DeAccent(GraftShim.expression(c)))
}

/** Catalyst expression for [[Accent.strip]], codegen-capable so it stays
  * inside whole-stage codegen and never fences parquet pushdown the way a
  * Scala UDF would.
  */
case class DeAccent(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deaccent requires a STRING argument, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deaccent"

  override protected def nullSafeEval(input: Any): Any =
    Accent.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Accent.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): DeAccent =
    copy(child = newChild)
}
