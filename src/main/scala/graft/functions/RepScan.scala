package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document repetition scan — the kernel behind the Gopher
  * §A1.1 signals (`rep_signals`): build every width-n token gram, sort,
  * and fold the run-length aggregates in ONE compiled pass per row.
  *
  * Why a custom expression and not HOFs: the composable form
  * (`aggregate(array_sort(transform(sequence(...), ...)), ...)`) pays
  * Spark's interpreted higher-order-function dispatch per ELEMENT — the
  * same lesson [[NgramDistinct]] already records. Measured on this exact
  * computation: ~2.8 ms/doc single-threaded for the 9-gram-width suite
  * (14 s for 5 000 docs at sf0.1), where this kernel's compiled pass is
  * ~50 µs/doc. Like the HOF form it shuffles NOTHING — the signal stays
  * a map-side projection at any corpus size; unlike a Scala UDF it needs
  * no row serialization and stays inside the codegen'd projection.
  *
  * Gram identity is the gram STRING (space-joined tokens), not a hash:
  * the tie-break contract (max count, then max char length, then
  * lexicographically smallest) and the char-mass metrics are defined on
  * the strings the DuckDB oracle sees, so the kernel must compare what
  * the oracle compares. UTF8String's byte-wise order equals DuckDB's
  * binary collation.
  */
object RepScanKernels {

  /** Column wrapper: repetition-scan struct of width-n grams of a
    * string-array column (n = 1 scans the elements themselves, e.g.
    * lines). Fields: top_c, top_g, dup_mass, n_runs, dup_extra — see
    * [[scan]].
    */
  def repScanCol(tokens: Column, n: Int): Column =
    GraftShim.column(RepScan(GraftShim.expression(tokens), n))

  val OutType: StructType = StructType(Seq(
    StructField("top_c", LongType, nullable = false),
    StructField("top_g", StringType, nullable = false),
    StructField("dup_mass", LongType, nullable = false),
    StructField("n_runs", LongType, nullable = false),
    StructField("dup_extra", LongType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  /** One row's scan. Full-width grams only (fewer than n tokens → the
    * zero struct, matching the oracle's `WHERE len(t) >= n`). Aggregates
    * over the gram MULTISET:
    *   - top_c/top_g: count and value of the most frequent gram (max
    *     count, tie → max char length, tie → lexicographically smallest)
    *   - dup_mass: Σ count·numChars over grams occurring ≥ 2 times
    *   - n_runs: distinct gram count
    *   - dup_extra: Σ (count−1)·numChars
    * Null array elements are treated as empty strings (the upstream
    * `split` never produces them; the guard keeps the kernel total).
    */
  def scan(arr: ArrayData, n: Int): InternalRow = {
    val m = arr.numElements()
    val k = if (m >= n) m - n + 1 else 0
    if (k == 0)
      return new GenericInternalRow(
        Array[Any](0L, UTF8String.EMPTY_UTF8, 0L, 0L, 0L))
    val gs = new Array[UTF8String](k)
    var i = 0
    while (i < k) {
      gs(i) =
        if (n == 1) {
          val v = arr.getUTF8String(i)
          if (v == null) UTF8String.EMPTY_UTF8 else v
        } else {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) {
            val v = arr.getUTF8String(i + j)
            parts(j) = if (v == null) UTF8String.EMPTY_UTF8 else v
            j += 1
          }
          UTF8String.concatWs(Space, parts: _*)
        }
      i += 1
    }
    java.util.Arrays.sort(gs.asInstanceOf[Array[AnyRef]])
    var topC = 0L
    var topG = UTF8String.EMPTY_UTF8
    var topLen = 0L
    var dupMass = 0L
    var nRuns = 0L
    var dupExtra = 0L
    // runs close in ascending order; strict > keeps the smallest on ties
    def close(v: UTF8String, c: Long): Unit = {
      val len = v.numChars().toLong
      if (c > topC || (c == topC && len > topLen)) {
        topC = c; topG = v; topLen = len
      }
      if (c >= 2) dupMass += c * len
      nRuns += 1
      dupExtra += (c - 1) * len
    }
    var prev = gs(0)
    var run = 1L
    var idx = 1
    while (idx < k) {
      if (gs(idx).equals(prev)) run += 1
      else { close(prev, run); prev = gs(idx); run = 1 }
      idx += 1
    }
    close(prev, run)
    new GenericInternalRow(Array[Any](topC, topG, dupMass, nRuns, dupExtra))
  }
}

case class RepScan(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"rep_scan requires array<string> and n > 0, got " +
        s"${child.dataType.catalogString}, n=$n")
  }

  override def dataType: DataType = RepScanKernels.OutType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rep_scan"

  override protected def nullSafeEval(arr: Any): Any =
    RepScanKernels.scan(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr =>
      s"${RepScanKernels.getClass.getName.stripSuffix("$")}" +
        s".scan($arr, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepScan =
    copy(child = newChild)
}
