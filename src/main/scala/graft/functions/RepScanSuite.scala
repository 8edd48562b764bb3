package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Split-free repetition-scan SUITE — the whole Gopher n-gram signal
  * family (widths 2..10 of [[RepScanKernels]]) computed from the raw
  * text in ONE expression evaluation per row, with no regex split, no
  * token-array materialization, and no per-gram string allocation.
  *
  * Why: the [[RepScan]] kernel already fused the per-width scan, but the
  * measured residual at the sf10 replica (~1 ms/doc) was tokenization
  * (regex `\s+` split into an UnsafeArrayData) plus nine per-width
  * passes each concatenating k gram strings and sorting them. This
  * kernel works on the row's bytes directly:
  *
  *   1. one byte pass tokenizes exactly like `split(trim(text), "\s+")`
  *      (ASCII-space trim; Java `\s` = `[ \t\n\x0B\f\r]`; limit −1
  *      split semantics, i.e. a leading/trailing non-space separator
  *      yields an empty edge token) and counts UTF-8 chars per token;
  *   2. one pass builds polynomial prefix hashes over the CANONICAL
  *      stream (tokens joined by a single 0x20), so any gram's hash is
  *      O(1) by range subtraction at every width;
  *   3. per width, grams group in an open-addressed table keyed by hash
  *      with byte-level verification (hash collisions cannot corrupt
  *      counts), and the run aggregates fold straight out of the table —
  *      no sort. Only the single winning top-gram STRING per width is
  *      ever materialized.
  *
  * The tie-break contract is byte-identical to [[RepScanKernels.scan]]
  * and the DuckDB oracle: max count, then max char length, then
  * lexicographically smallest gram in unsigned-byte order (UTF8String
  * binary order = DuckDB binary collation). The struct also carries
  * `nl`, the char length of the space-joined token stream, replacing the
  * separate `length(array_join(tokens, ' '))` projection.
  *
  * Scale shape: identical to the per-width kernels — a row-local
  * projection, zero shuffle, codegen-friendly (one static call) — with
  * the constant cut; parity is spec-pinned against the split+[[RepScan]]
  * composition on planted edge cases (RepScanSuiteSpec).
  */
object RepScanSuiteKernels {

  val MinN = 2
  val MaxN = 10

  val OutType: StructType = StructType(
    StructField("nl", LongType, nullable = false) +:
      (MinN to MaxN).map(n =>
        StructField(s"sc$n", RepScanKernels.OutType, nullable = false)))

  def repScanSuiteCol(text: Column): Column =
    GraftShim.column(RepScanSuite(GraftShim.expression(text)))

  /** Odd multiplier for the mod-2^64 polynomial rolling hash. */
  private val B = 0x9e3779b97f4a7c15L

  private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private def zeroStruct: GenericInternalRow =
    new GenericInternalRow(
      Array[Any](0L, UTF8String.EMPTY_UTF8, 0L, 0L, 0L))

  def scan(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    // trim ASCII space ONLY — the `trim(text)` the composed form applies
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1

    // ---- tokenize: limit -1 regex-split semantics on [ \t\n\v\f\r]+
    var cap = math.max(4, (hi - lo) / 2 + 2)
    var starts = new Array[Int](cap)
    var lens = new Array[Int](cap)
    var charLens = new Array[Int](cap)
    var m = 0
    def addToken(start: Int, len: Int): Unit = {
      if (m == cap) {
        cap *= 2
        starts = java.util.Arrays.copyOf(starts, cap)
        lens = java.util.Arrays.copyOf(lens, cap)
        charLens = java.util.Arrays.copyOf(charLens, cap)
      }
      starts(m) = start
      lens(m) = len
      var ch = 0
      var k = start
      val end = start + len
      while (k < end) {
        if ((bytes(k) & 0xc0) != 0x80) ch += 1
        k += 1
      }
      charLens(m) = ch
      m += 1
    }
    if (hi == lo) addToken(lo, 0) // split("") = [""]
    else {
      if (isSep(bytes(lo))) addToken(lo, 0) // leading empty edge token
      var pos = lo
      while (pos < hi) {
        if (isSep(bytes(pos))) pos += 1
        else {
          val st = pos
          while (pos < hi && !isSep(bytes(pos))) pos += 1
          addToken(st, pos - st)
        }
      }
      if (isSep(bytes(hi - 1))) addToken(hi, 0) // trailing empty edge token
    }

    // ---- canonical stream prefix hashes (tokens joined by 0x20)
    var canonLen = m - 1
    var i = 0
    while (i < m) { canonLen += lens(i); i += 1 }
    val pref = new Array[Long](canonLen + 1)
    val pow = new Array[Long](canonLen + 1)
    val cst = new Array[Int](m) // canonical start per token
    val charPre = new Array[Int](m + 1) // char-length prefix over tokens
    pow(0) = 1L
    var c = 0
    i = 0
    while (i < m) {
      cst(i) = c
      charPre(i + 1) = charPre(i) + charLens(i)
      var k = starts(i)
      val end = starts(i) + lens(i)
      while (k < end) {
        pref(c + 1) = pref(c) * B + (bytes(k) & 0xff)
        pow(c + 1) = pow(c) * B
        c += 1
        k += 1
      }
      if (i < m - 1) {
        pref(c + 1) = pref(c) * B + 0x20
        pow(c + 1) = pow(c) * B
        c += 1
      }
      i += 1
    }
    def canonEnd(g: Int, n: Int): Int = cst(g + n - 1) + lens(g + n - 1)
    def rangeHash(l: Int, r: Int): Long = pref(r) - pref(l) * pow(r - l)

    // unsigned-byte lexicographic compare of two grams' canonical bytes
    def compareGrams(a: Int, b: Int, n: Int): Int = {
      val spanA = canonEnd(a, n) - cst(a)
      val spanB = canonEnd(b, n) - cst(b)
      val limit = math.min(spanA, spanB)
      var p = 0
      var tA = a; var oA = 0
      var tB = b; var oB = 0
      while (p < limit) {
        val ba: Int =
          if (oA < lens(tA)) { val v = bytes(starts(tA) + oA) & 0xff; oA += 1; v }
          else { tA += 1; oA = 0; 0x20 }
        val bb: Int =
          if (oB < lens(tB)) { val v = bytes(starts(tB) + oB) & 0xff; oB += 1; v }
          else { tB += 1; oB = 0; 0x20 }
        if (ba != bb) return ba - bb
        p += 1
      }
      spanA - spanB
    }

    // ---- shared open-addressed table, cleared per width
    val maxK = m - MinN + 1
    val out = new Array[Any](OutType.length)
    out(0) = (charPre(m) + (m - 1)).toLong // nl
    if (maxK <= 0) {
      var f = 1
      while (f < OutType.length) { out(f) = zeroStruct; f += 1 }
      return new GenericInternalRow(out)
    }
    var tsize = 4
    while (tsize < 2 * maxK) tsize <<= 1
    val mask = tsize - 1
    val tblHash = new Array[Long](tsize)
    val tblGram = new Array[Int](tsize)
    val tblCount = new Array[Int](tsize)

    var n = MinN
    while (n <= MaxN) {
      val k = m - n + 1
      if (k <= 0) out(n - MinN + 1) = zeroStruct
      else {
        java.util.Arrays.fill(tblGram, -1)
        var g = 0
        while (g < k) {
          val h = rangeHash(cst(g), canonEnd(g, n))
          var idx = ((h ^ (h >>> 32)).toInt) & mask
          var placed = false
          while (!placed) {
            val occ = tblGram(idx)
            if (occ == -1) {
              tblGram(idx) = g; tblHash(idx) = h; tblCount(idx) = 1
              placed = true
            } else if (tblHash(idx) == h && compareGrams(occ, g, n) == 0) {
              tblCount(idx) += 1
              placed = true
            } else idx = (idx + 1) & mask
          }
          g += 1
        }
        var topC = 0L
        var topG = -1
        var topLen = 0L
        var dupMass = 0L
        var nRuns = 0L
        var dupExtra = 0L
        var idx = 0
        while (idx < tsize) {
          val gr = tblGram(idx)
          if (gr != -1) {
            val cnt = tblCount(idx).toLong
            val len = (charPre(gr + n) - charPre(gr) + (n - 1)).toLong
            if (cnt > topC || (cnt == topC && (len > topLen ||
                (len == topLen && compareGrams(gr, topG, n) < 0)))) {
              topC = cnt; topG = gr; topLen = len
            }
            if (cnt >= 2) dupMass += cnt * len
            nRuns += 1
            dupExtra += (cnt - 1) * len
          }
          idx += 1
        }
        // materialize ONLY the winner's gram string
        val span = canonEnd(topG, n) - cst(topG)
        val gb = new Array[Byte](span)
        var w = 0
        var t = topG
        while (t < topG + n) {
          System.arraycopy(bytes, starts(t), gb, w, lens(t))
          w += lens(t)
          if (t < topG + n - 1) { gb(w) = 0x20; w += 1 }
          t += 1
        }
        out(n - MinN + 1) = new GenericInternalRow(Array[Any](
          topC, UTF8String.fromBytes(gb), dupMass, nRuns, dupExtra))
      }
      n += 1
    }
    new GenericInternalRow(out)
  }
}

case class RepScanSuite(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rep_scan_suite requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = RepScanSuiteKernels.OutType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rep_scan_suite"

  override protected def nullSafeEval(s: Any): Any =
    RepScanSuiteKernels.scan(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"${RepScanSuiteKernels.getClass.getName.stripSuffix("$")}.scan($s)")

  override protected def withNewChildInternal(newChild: Expression): RepScanSuite =
    copy(child = newChild)
}
