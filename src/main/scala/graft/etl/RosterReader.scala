package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** S2 — positional slice + header promotion (`app.py:236-238`): the raw
  * roster sheet carries 3 preamble rows, the 4th row IS the header, data
  * follows. Plus the reference's rename map (`app.py:240-245`), including
  * the infamous trailing-space `"Nombres "` header.
  *
  * Row order: a single-file CSV read is ordered within its one split, and
  * `zipWithIndex` preserves partition-then-offset order, so the ordinals
  * are file-line ordinals. `monotonically_increasing_id` would NOT be
  * (SURVEY.md §7.4.1). This operator is inherently for human-sized
  * roster files — the positional contract doesn't scale past one split
  * and doesn't need to.
  */
object RosterReader {

  val DefaultRenames: Map[String, String] = Map(
    "Rut (con punto y con guión)" -> "rut",
    "Nombres "                    -> "nombres",
    "Apellidos"                   -> "apellidos",
    "Correo electrónico"          -> "email")

  /** Read a headerless CSV, promote row `headerRow` (0-based) to column
    * names, drop everything before the first data row, apply renames.
    */
  def read(spark: SparkSession, path: String, headerRow: Int = 3,
           renames: Map[String, String] = DefaultRenames): DataFrame = {
    val raw = spark.read
      .option("header", "false").option("encoding", "UTF-8").csv(path)
    val schema  = raw.schema
    val indexed = raw.rdd.zipWithIndex()

    val headerVals = indexed.filter(_._2 == headerRow).map(_._1).collect() match {
      case Array(row) => row.toSeq.map(v => if (v == null) "" else v.toString)
      case _ => throw new IllegalArgumentException(
        s"roster has no row $headerRow to promote to a header")
    }
    // Uniquify blank/duplicate promoted names so toDF can't collide.
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val names = headerVals.zipWithIndex.map { case (h, i) =>
      val base = if (h.trim.isEmpty) s"_c$i" else h
      val n    = seen.getOrElse(base, 0)
      seen(base) = n + 1
      if (n == 0) base else s"${base}_$n"
    }

    val data = indexed.filter(_._2 > headerRow).map(_._1)
    val df   = spark.createDataFrame(data.asInstanceOf[org.apache.spark.rdd.RDD[Row]], schema)
      .toDF(names: _*)
    df.withColumnsRenamed(renames)
  }
}
