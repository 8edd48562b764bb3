package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property coverage for the split-free suite kernel: on ARBITRARY
  * strings built from unicode-bearing tokens joined by random
  * whitespace runs (with random leading/trailing whitespace), the byte
  * tokenizer + hash-grouped scan must equal the reference composition —
  * JVM `trim`-spaces + regex `\s+` limit −1 split feeding the
  * per-width [[RepScanKernels.scan]] — field for field at every width,
  * plus the joined-length contract. Direct kernel calls, no Spark
  * plan, so thousands of samples run in milliseconds and shrinking
  * pinpoints any divergent input.
  */
object RepScanSuiteProps extends Properties("RepScanSuite") {

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5)),
    Gen.oneOf("a", "ab", "the", "héé", "wörld", "naïve", "ÉÊ", "x1", "’", "€9"))

  private val ws: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(" ", "\t", "\n", "", "\f", "\r"))
      .map(_.take(3).mkString)

  /** tokens joined by random whitespace, random ragged edges. */
  private val doc: Gen[String] = for {
    toks <- Gen.listOf(token).map(_.take(30))
    seps <- Gen.listOfN(math.max(toks.size - 1, 0), ws)
    lead <- Gen.oneOf("", " ", "\t", " \t ", "\n")
    trail <- Gen.oneOf("", " ", "\n", "  ", "\r ")
    // heavy-repetition variant half the time: tiny vocab amplifies ties
    rep <- Gen.oneOf(true, false)
    repToks <- Gen.listOf(Gen.oneOf("a", "b", "ab")).map(_.take(30))
  } yield {
    val ts = if (rep) repToks else toks
    val ss = if (rep) List.fill(math.max(ts.size - 1, 0))(" ") else seps
    lead + (if (ts.isEmpty) ""
            else ts.head + ss.zip(ts.tail).map { case (s, t) => s + t }.mkString) + trail
  }

  /** Reference: space-trim + regex split limit −1 + per-width RepScan. */
  private def reference(text: String): (Long, Seq[InternalRow]) = {
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val toks = text.substring(lo, hi).split("\\s+", -1)
    val arr = new GenericArrayData(
      toks.map(t => UTF8String.fromString(t): Any))
    val nl = UTF8String.fromString(toks.mkString(" ")).numChars.toLong
    (nl, (2 to 10).map(n => RepScanKernels.scan(arr, n)))
  }

  private def structEq(a: InternalRow, b: InternalRow): Boolean =
    a.getLong(0) == b.getLong(0) &&
      a.getUTF8String(1) == b.getUTF8String(1) &&
      a.getLong(2) == b.getLong(2) &&
      a.getLong(3) == b.getLong(3) &&
      a.getLong(4) == b.getLong(4)

  property("suite == trim+split+RepScan on arbitrary whitespace-ragged text") =
    Prop.forAll(doc) { text =>
      val su = RepScanSuiteKernels.scan(UTF8String.fromString(text))
      val (refNl, refs) = reference(text)
      val nlOk = su.getLong(0) == refNl
      val scansOk = (2 to 10).forall { n =>
        structEq(su.getStruct(n - 1, 5), refs(n - 2))
      }
      (nlOk && scansOk) :| s"text=${text.map(c => f"\\u${c.toInt}%04x").mkString}"
    }
}
