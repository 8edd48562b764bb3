package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd quantizer kernels over a literal centroid bank.
  *
  * The composable formulation — `greatest(struct(dot(v, c₀) − h₀, id₀),
  * …, struct(dot(v, c₆₃) − h₆₃, id₆₃))` — is semantically identical but
  * UNROLLS the bank into the generated source: at 64 cells × 8 dims per
  * subspace × 8 subspaces in one projection, the stage blows janino's
  * 64 KB method limit, so Spark pays a doomed compile and then runs the
  * whole stage interpreted. These expressions carry the bank as a
  * reference object and generate a compact nested LOOP instead — code
  * size is constant in the bank size, and the per-row arithmetic is the
  * same strict left-to-right multiply-add as [[VectorKernels.dot]], so
  * results are bit-identical to the unrolled form (asserted in
  * SimilaritySpec) and the DuckDB oracle mirrors are unchanged.
  */
object CellKernels {

  /** Argmax_c (v·cv_c − h_c) over the bank, ties to the HIGHEST cell id
    * — the [[graft.operators.Similarity]] L2 assignment rule. NULL iff
    * v is NULL.
    *
    * NaN caveat: `greatest` over the unrolled struct chain treats NaN
    * as larger than any value, while this loop's `acc > best` never
    * selects a NaN affinity — so the two forms differ on a vector
    * containing NaN. All callers feed finite vectors by construction
    * (parquet float embeddings and their residuals; norms > 0), so the
    * bit-identity claim is scoped to finite inputs.
    */
  def nearestCellL2(v: Column, cids: Array[Long], cvs: Array[Array[Double]],
                    hs: Array[Double]): Column =
    GraftShim.column(NearestCellL2(GraftShim.expression(v), cids, cvs, hs))

  /** One dot product per bank row: returns array&lt;double&gt; with
    * d_c = v·cv_c in bank order — the per-query ADC table build. NULL
    * iff v is NULL.
    */
  def dotTable(v: Column, cvs: Array[Array[Double]]): Column =
    GraftShim.column(DotTable(GraftShim.expression(v), cvs))

  private[functions] def elemFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private[functions] def checkVec(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$name requires an array<float|double> input, got ${t.catalogString}")
    }
}

case class NearestCellL2(child: Expression, cids: Array[Long],
                         cvs: Array[Array[Double]], hs: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    CellKernels.checkVec(child, prettyName)

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cell_l2"

  private lazy val vFloat = CellKernels.elemFloat(child)

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var best = Double.NegativeInfinity
    var bc = -1L
    var c = 0
    while (c < cvs.length) {
      val cv = cvs(c)
      val n = math.min(a.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (vFloat) a.getFloat(i).toDouble else a.getDouble(i)) * cv(i)
        i += 1
      }
      acc -= hs(c)
      if (acc > best || (acc == best && cids(c) > bc)) { best = acc; bc = cids(c) }
      c += 1
    }
    bc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cvsRef = ctx.addReferenceObj("cvs", cvs, "double[][]")
      val hsRef = ctx.addReferenceObj("hs", hs, "double[]")
      val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getV = if (vFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |double $best = Double.NEGATIVE_INFINITY;
         |long $bc = -1L;
         |for (int $c = 0; $c < $cvsRef.length; $c++) {
         |  final double[] $cv = $cvsRef[$c];
         |  final int $n = Math.min($v.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $getV * $cv[$i];
         |  }
         |  $acc -= $hsRef[$c];
         |  if ($acc > $best || ($acc == $best && $cidsRef[$c] > $bc)) {
         |    $best = $acc;
         |    $bc = $cidsRef[$c];
         |  }
         |}
         |${ev.value} = $bc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellL2 =
    copy(child = newChild)
}

case class DotTable(child: Expression, cvs: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    CellKernels.checkVec(child, prettyName)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_table"

  private lazy val vFloat = CellKernels.elemFloat(child)

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val out = new Array[Double](cvs.length)
    var c = 0
    while (c < cvs.length) {
      val cv = cvs(c)
      val n = math.min(a.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (vFloat) a.getFloat(i).toDouble else a.getDouble(i)) * cv(i)
        i += 1
      }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cvsRef = ctx.addReferenceObj("cvs", cvs, "double[][]")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getV = if (vFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |final double[] $out = new double[$cvsRef.length];
         |for (int $c = 0; $c < $cvsRef.length; $c++) {
         |  final double[] $cv = $cvsRef[$c];
         |  final int $n = Math.min($v.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $getV * $cv[$i];
         |  }
         |  $out[$c] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DotTable =
    copy(child = newChild)
}
