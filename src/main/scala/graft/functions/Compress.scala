package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
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
  // Native zlib memory is released DETERMINISTICALLY: inside a Spark
  // task the instance registers a completion listener that end()s it
  // and clears the slot (construction is per-task, reuse is per-row —
  // the part that matters), so executor thread churn can't strand
  // native state until GC. Outside a task (driver/tests) the JDK's own
  // Cleaner on Deflater reclaims it when the thread-local unroots.
  private val deflaters: ThreadLocal[Deflater] = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = {
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        d.end()
        deflaters.remove()
      }
      d
    }
  }
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](32 * 1024)
  }

  /** Deflated byte count of a string's UTF-8 bytes (0 for empty). */
  def deflatedLength(s: UTF8String): Long = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 0L
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = buffers.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** JVM-side kernel shared by interpreted eval and generated code. */
  def ratio(s: UTF8String): Double = {
    val n = s.numBytes()
    if (n == 0) return 1.0
    deflatedLength(s).toDouble / n
  }

  /** Column API: `deflateRatio($"text")`. */
  def deflateRatio(c: Column): Column =
    GraftShim.column(DeflateRatio(GraftShim.expression(c)))

  /** Column API: `deflateLen($"text")` — compressed byte count. */
  def deflateLen(c: Column): Column =
    GraftShim.column(DeflateLen(GraftShim.expression(c)))
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

/** Compressed byte count (raw deflate, level 6) — the integer sibling
  * of [[DeflateRatio]], used where exact arithmetic over the deflated
  * size beats a rounded-back ratio (e.g. the structural-invariant
  * tolerance oracle of `compress_ratio`).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires a STRING argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    Compress.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Compress.deflatedLength($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
