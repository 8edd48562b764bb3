package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two sort
  * dimensions so range-partitioning the single code co-locates rows that
  * are close in BOTH dimensions. This is the 100 TB data-skipping play —
  * parquet keeps per-file/rowgroup min-max stats, so a scan filtered on
  * EITHER dimension prunes files after a z-ordered write, where a
  * lexicographic sort only ever prunes on its leading column (the layout
  * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * The bit-spread is pure Column arithmetic (shift/mask, the classic
  * binary-magic-numbers expansion) — whole-stage-codegen'd, no UDF, and
  * bit-identical in any engine, which is what lets the layout quality
  * check carry a DuckDB oracle.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to the even bit positions of a 32-bit
    * lane: abcdefgh… → a0b0c0d0…. Inputs must already be masked to
    * 16 bits.
    */
  private def spread16(x: Column): Column = {
    val s1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit grid coordinates (`a` in the even
    * bits, `b` in the odd bits). Callers with wider domains rank or
    * bucket to 16 bits first.
    */
  def mortonCode(a: Column, b: Column): Column =
    spread16(a.cast("long").bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread16(b.cast("long").bitwiseAND(lit(0xFFFFL))), 1))

  /** Lay `df` out along the Morton curve of (`a`, `b`): range-partition
    * on the code into `numPartitions` output partitions and sort within
    * each, so every written file covers a compact z-curve segment — a
    * small RECTANGLE in (a, b) space — and carries tight min-max stats
    * for both columns.
    */
  def zorderRepartition(df: DataFrame, a: String, b: String,
                        numPartitions: Int): DataFrame = {
    val coded = df.withColumn("__z", mortonCode(col(a), col(b)))
    coded.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
