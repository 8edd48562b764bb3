package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** Minimal single-sheet OOXML (.xlsx) reader — JDK only (`java.util.zip`
  * + `javax.xml.stream`), no external dependency, which is what makes an
  * Excel source possible in this offline build at all. Closes the one
  * reference *source* gap: the reference roster arrives as
  * `pd.read_excel(path, sheet_name=0)` (`/root/reference/app.py:234`).
  *
  * Scope (deliberately the reference's): the FIRST worksheet, cell values
  * as strings — shared strings, inline strings, plain/formula-cached
  * values, booleans. No styles, dates-as-serials arrive as their raw
  * serial string (the reference roster carries text cells). This is a
  * driver-side parser for human-sized roster files, the same contract as
  * [[graft.etl.RosterReader]]'s positional header promotion — corpus-
  * scale data belongs in parquet, not xlsx.
  */
object Xlsx {

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // hygiene for untrusted zip content: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** OLE2 compound-document magic — the container of legacy BIFF `.xls`
    * workbooks (and every other pre-OOXML Office format).
    */
  private val Ole2Magic: Array[Byte] =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  /** Rows of the first worksheet, sparse cells resolved by their `r`
    * reference: missing cells are null, trailing width ragged (callers
    * pad to their schema width). Driver-side by design — see class doc.
    *
    * Legacy `.xls` parity (`app.py:792` accepts `*.xls *.xlsx` in the
    * file dialog, but `pd.read_excel` then needs the xlrd engine the
    * reference never ships): a BIFF workbook is DETECTED by its OLE2
    * container magic — not by file extension, which lies — and rejected
    * with a typed, actionable error instead of the opaque ZipException
    * a zip open would throw. Asserted in RosterReaderSpec.
    */
  def readRows(path: String): Vector[Vector[String]] = {
    val head = {
      val in = new java.io.FileInputStream(path)
      try in.readNBytes(Ole2Magic.length) finally in.close()
    }
    if (java.util.Arrays.equals(head, Ole2Magic))
      throw new IllegalArgumentException(
        s"$path is a legacy .xls (BIFF/OLE2) workbook; this reader supports " +
          ".xlsx (OOXML) only — re-save the roster as .xlsx")
    val zip = new ZipFile(path)
    try {
      val shared = entry(zip, "xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
      val sheetPath = firstSheetTarget(zip)
      parseSheet(zip, sheetPath, shared)
    } finally zip.close()
  }

  private def entry(zip: ZipFile, name: String): Option[java.io.InputStream] =
    Option(zip.getEntry(name)).map(zip.getInputStream)

  private def reader(zip: ZipFile, name: String): XMLStreamReader =
    factory.createXMLStreamReader(entry(zip, name).getOrElse(
      throw new IllegalArgumentException(s"xlsx is missing $name")))

  /** First `<sheet>` of workbook.xml, resolved through the workbook rels
    * to its worksheet part path (writers are free to name parts anything;
    * `xl/worksheets/sheet1.xml` is only a convention).
    */
  private def firstSheetTarget(zip: ZipFile): String = {
    var rid: String = null
    val wb = reader(zip, "xl/workbook.xml")
    try {
      while (rid == null && wb.hasNext) {
        if (wb.next() == XMLStreamConstants.START_ELEMENT && wb.getLocalName == "sheet")
          rid = attr(wb, "id") // r:id — matched by local name, any ns
      }
    } finally wb.close()
    if (rid == null) throw new IllegalArgumentException("xlsx has no sheets")

    var target: String = null
    val rels = reader(zip, "xl/_rels/workbook.xml.rels")
    try {
      while (target == null && rels.hasNext) {
        if (rels.next() == XMLStreamConstants.START_ELEMENT &&
            rels.getLocalName == "Relationship" && attr(rels, "Id") == rid)
          target = attr(rels, "Target")
      }
    } finally rels.close()
    if (target == null) throw new IllegalArgumentException(s"no relationship for sheet $rid")
    if (target.startsWith("/")) target.drop(1)
    else "xl/" + target
  }

  /** `<si>` entries, each the concatenation of its `<t>` runs (plain and
    * rich-text shared strings alike).
    */
  private def parseSharedStrings(in: java.io.InputStream): Vector[String] = {
    val r = factory.createXMLStreamReader(in)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "si") { inSi = true; cur.clear() }
          else if (inSi && r.getLocalName == "t") inT = true
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT) cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "t") inT = false
          else if (r.getLocalName == "si") { inSi = false; out += cur.toString }
        case _ =>
      }
    } finally r.close()
    out.result()
  }

  /** One worksheet part → rows of nullable strings. Cell semantics by the
    * `t` attribute: `s` = shared-string index, `inlineStr` = nested
    * `<is><t>`, `b` = boolean 0/1 (surfaced as "0"/"1" — string cells are
    * the roster contract), anything else (`n`, `str`, absent) = the `<v>`
    * text verbatim. Formula bodies (`<f>`) are skipped; their cached
    * `<v>` result is what a reader sees, same as pandas.
    */
  private def parseSheet(zip: ZipFile, part: String,
                         shared: Vector[String]): Vector[Vector[String]] = {
    val r = reader(zip, part)
    val rows = Vector.newBuilder[Vector[String]]
    var cells: scala.collection.mutable.ArrayBuffer[String] = null
    var cellIdx = -1    // 0-based column of the current <c>
    var nextIdx = 0     // position if a <c> carries no r= reference
    var cellType = ""
    var text = new StringBuilder
    var capture = false // inside <v>, or inside <is><t>
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => cells = scala.collection.mutable.ArrayBuffer.empty[String]; nextIdx = 0
          case "c" if cells != null =>
            cellIdx = Option(attr(r, "r")).map(colIndex).getOrElse(nextIdx)
            cellType = Option(attr(r, "t")).getOrElse("")
            text = new StringBuilder; capture = false
          case "v" => capture = true
          case "t" if cellType == "inlineStr" => capture = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (capture) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => capture = false
          case "t" => capture = false
          case "c" if cells != null =>
            val raw = text.toString
            val value = cellType match {
              case "s"         => shared.lift(raw.trim.toInt).orNull
              case "inlineStr" => raw
              case _           => if (raw.isEmpty) null else raw
            }
            while (cells.length < cellIdx) cells += null // sparse gap
            cells += value
            nextIdx = cellIdx + 1
          case "row" => rows += cells.toVector; cells = null
          case _ =>
        }
        case _ =>
      }
    } finally r.close()
    rows.result()
  }

  /** "BC7" → 54: base-26 letters prefix, 0-based. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def attr(r: XMLStreamReader, localName: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == localName) return r.getAttributeValue(i)
      i += 1
    }
    null
  }
}
