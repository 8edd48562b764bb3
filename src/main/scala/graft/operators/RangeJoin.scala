package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval ("band") join: pairs up left and right rows with the
  * same key where the right timestamp falls inside a fixed-width window
  * ending at the left timestamp: `lts - windowUs <= rts < lts`.
  *
  * The naive rendition — an equi-join on the key plus a range predicate —
  * plans as a join on key alone with the range as a post-filter, which on
  * a hot key degenerates to that key's full cross product. Here both
  * sides are additionally bucketed by `windowUs`-sized time cells, the
  * right side duplicated into its own and the NEXT cell (every qualifying
  * pair spans at most one cell boundary), and the equi-join runs on
  * (key, cell). Candidate pairs are bounded by per-cell density, not
  * per-key volume — the standard streaming interval-join layout, in
  * batch form.
  */
object RangeJoin {

  /** @param left     left frame; all its columns survive
    * @param right    right frame
    * @param key      equi-join key column name (both sides)
    * @param leftTs   left epoch-micros column name
    * @param rightTs  right epoch-micros column name
    * @param windowUs window width in microseconds: match right rows in
    *                 `[leftTs - windowUs, leftTs)` (strictly before the
    *                 left event, at most windowUs older)
    * @param rightPayload right columns to carry, renamed as given
    */
  private val Reserved = Seq("__cell", "__rkey", "__rts")

  def before(left: DataFrame, right: DataFrame, key: String,
             leftTs: String, rightTs: String, windowUs: Long,
             rightPayload: Map[String, String]): DataFrame = {
    require(windowUs > 0, s"window must be positive, got $windowUs")
    val clash = (left.columns ++ right.columns).filter(Reserved.contains)
    require(clash.isEmpty,
      s"range join inputs may not use reserved column names: ${clash.mkString(", ")}")
    val l = left.withColumn("__cell", expr(s"$leftTs div ${windowUs}L"))
    val r = right
      .select(col(key).as("__rkey") +: col(rightTs).as("__rts") +:
        rightPayload.map { case (from, to) => col(from).as(to) }.toSeq: _*)
      .withColumn("__cell",
        explode(array(expr(s"__rts div ${windowUs}L"),
          expr(s"__rts div ${windowUs}L") + 1)))
    l.join(r, l(key) === r("__rkey") && l("__cell") === r("__cell") &&
        col("__rts") >= col(leftTs) - windowUs && col("__rts") < col(leftTs))
      .drop("__cell", "__rkey", "__rts")
  }
}
