package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a document's UTF-8 bytes — the classic
  * "too compressible = boilerplate/repetition" quality filter from
  * large-corpus curation pipelines (Rae et al. 2021 §A1.1 use exactly
  * this signal), complementing `qualityScore`'s length/TTR/stopword
  * features: zlib sees long-range repetition that a unique-token ratio
  * misses. JDK-only (`java.util.zip.Deflater`), level 6, raw deflate
  * (no zlib header so tiny strings aren't swamped by framing bytes).
  *
  * Ratio = deflated_len / raw_len; lower = more redundant. Empty
  * input is defined as 1.0 (incompressible nothing). Values slightly
  * above 1.0 are possible on high-entropy input — callers threshold on
  * the low side, so that tail is harmless.
  */
object Compress {

  // Deflater holds native state and costs ~μs to construct; one per
  // executor thread, reset() per row, is the standard reuse pattern.
  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
  }
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](32 * 1024)
  }

  /** JVM-side kernel shared by interpreted eval and generated code. */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = buffers.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Column API: `deflateRatio($"text")`. */
  def deflateRatio(c: Column): Column =
    GraftShim.column(DeflateRatio(GraftShim.expression(c)))
}

/** Catalyst expression for [[Compress.ratio]]; codegen-capable so the
  * scan→filter pipeline around it stays one whole-stage-codegen span.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires a STRING argument, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    Compress.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Compress.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}
