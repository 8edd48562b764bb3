package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S2 — positional slice + header promotion (`app.py:236-238`): the raw
  * roster sheet carries 3 preamble rows, the 4th row IS the header, data
  * follows. Plus the reference's rename map (`app.py:240-245`), including
  * the infamous trailing-space `"Nombres "` header.
  *
  * Two-pass read, because schema inference on a headerless CSV takes the
  * column count from the FIRST line — and preamble lines are typically
  * narrower than the header, which would silently truncate every column
  * past the preamble's width. Pass 1 finds the header row as raw text
  * and parses just that line; pass 2 re-reads with an explicit all-string
  * schema of the header's width (short rows pad with NULL).
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
    import spark.implicits._

    // Pass 1: the header LINE, parsed alone so its width wins.
    val headerLine = spark.read.textFile(path).rdd.zipWithIndex()
      .filter(_._2 == headerRow).map(_._1).collect() match {
      case Array(line) => line
      case _ => throw new IllegalArgumentException(
        s"roster has no row $headerRow to promote to a header")
    }
    val headerVals = spark.read.csv(Seq(headerLine).toDS())
      .head().toSeq.map(v => if (v == null) "" else v.toString)
    val names = promoteNames(headerVals)

    // Pass 2: explicit all-string schema at the header's width; narrow
    // rows (preamble included) pad with NULLs instead of truncating the
    // whole frame. multiLine=false pinned explicitly: pass 1 indexed
    // PHYSICAL lines, so pass 2's records must be physical lines too — a
    // quoted embedded newline before the header would otherwise shift
    // every index and promote the wrong row.
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    val raw = spark.read.schema(schema)
      .option("header", "false").option("encoding", "UTF-8")
      .option("multiLine", "false")
      .option("mode", "PERMISSIVE").csv(path)
    val data = raw.rdd.zipWithIndex().filter(_._2 > headerRow).map(_._1)
    spark.createDataFrame(data, schema).withColumnsRenamed(renames)
  }

  /** The reference's ACTUAL source format (`pd.read_excel`,
    * `app.py:234`): first worksheet of an .xlsx via the JDK-only
    * [[graft.sources.Xlsx]] reader, then the identical positional
    * header-promotion contract as [[read]] — sheet row `headerRow` (0-
    * based) becomes the schema, earlier rows are preamble, narrow rows
    * pad with NULL and wide rows truncate to the header's width. Parsing
    * is driver-side: the positional contract is inherently for human-
    * sized roster files (class doc), exactly like the CSV path's
    * driver-collected header line.
    */
  def readXlsx(spark: SparkSession, path: String, headerRow: Int = 3,
               renames: Map[String, String] = DefaultRenames): DataFrame = {
    val rows = graft.sources.Xlsx.readRows(path)
    if (rows.length <= headerRow) throw new IllegalArgumentException(
      s"roster has no row $headerRow to promote to a header")
    val names = promoteNames(rows(headerRow).map(v => if (v == null) "" else v))
    val width = names.length
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    val data = rows.drop(headerRow + 1).map(r =>
      org.apache.spark.sql.Row.fromSeq(r.padTo(width, null).take(width)))
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
      .withColumnsRenamed(renames)
  }

  /** Uniquify blank/duplicate promoted header names so toDF can't
    * collide (shared by the CSV and xlsx paths).
    */
  private def promoteNames(headerVals: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    headerVals.zipWithIndex.map { case (h, i) =>
      val base = if (h.trim.isEmpty) s"_c$i" else h
      val n    = seen.getOrElse(base, 0)
      seen(base) = n + 1
      if (n == 0) base else s"${base}_$n"
    }
  }
}
