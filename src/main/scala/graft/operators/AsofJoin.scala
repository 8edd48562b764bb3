package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the largest
  * timestamp strictly before the left row's, per key.
  *
  * Spark has no native as-of join; the naive rendition (per-left-row
  * max-subquery, or a range join) degenerates to a partial cross product
  * on hot keys. This implementation uses the union + carry-forward
  * window: tag both sides, union, and per key in timestamp order carry
  * the last-seen right payload forward with `last(ignoreNulls)` — ONE
  * shuffle on the key, linear work, no pair blow-up at any key skew.
  * Right rows at the exact same timestamp sort AFTER left rows, so
  * "strictly before" holds even under timestamp ties.
  */
object AsofJoin {

  private val Reserved = Seq("__ts", "__side", "__r", "__rseq", "__match")

  /** @param left     left frame
    * @param right    right frame
    * @param key      equi-join key column name (both sides)
    * @param leftTs   left ordering column name (numeric or timestamp)
    * @param rightTs  right ordering column name
    * @param leftSeq  unique per-key tiebreak on the left (determinism)
    * @param rightPayload right columns to carry (renamed as given)
    * @param rightSeq unique per-key tiebreak on the right: when several
    *                 right rows share (key, ts), the one with the LARGEST
    *                 seq wins deterministically. Pass None only if such
    *                 ties are impossible in the input.
    * @param leftOuter keep unmatched left rows with NULL payload (ASOF
    *                 LEFT JOIN); default drops them (inner, like DuckDB's
    *                 ASOF JOIN default)
    * @return left rows + carried right payload
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTs: String, rightTs: String, leftSeq: String,
            rightPayload: Map[String, String],
            rightSeq: Option[String] = None,
            leftOuter: Boolean = false): DataFrame = {
    val clash = (left.columns ++ right.columns).filter(Reserved.contains)
    require(clash.isEmpty,
      s"as-of join inputs may not use reserved column names: ${clash.mkString(", ")}")
    val leftCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__r", lit(null).cast(structType(right, rightPayload)))
    val r = right
      .select(col(key) +: col(rightTs).as("__ts") +: Seq(
        lit(1).as("__side"),
        rightSeq.map(col).getOrElse(lit(null).cast("string")).as("__rseq"),
        struct(rightPayload.map { case (from, to) => col(from).as(to) }.toSeq: _*).as("__r")): _*)
    val unioned = l.select(
      (leftCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__r")): _*)
      .unionByName(r, allowMissingColumns = true)

    // left rows sort BEFORE right rows at equal __ts (strict <); the
    // per-side sequence columns break remaining ties deterministically
    // (left rows all have NULL __rseq; right rows all have NULL leftSeq).
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col(leftSeq).asc_nulls_last,
        col("__rseq").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      // left-outer keeps unmatched left rows: field access on the NULL
      // match struct yields NULL payload columns
      .filter(col("__side") === 0 &&
        (if (leftOuter) lit(true) else col("__match").isNotNull))
      .select(leftCols.map(col) :+ col("__match.*"): _*)
  }

  private def structType(right: DataFrame, payload: Map[String, String]) = {
    val fields = payload.map { case (from, to) =>
      org.apache.spark.sql.types.StructField(to, right.schema(from).dataType)
    }
    org.apache.spark.sql.types.StructType(fields.toSeq)
  }
}
