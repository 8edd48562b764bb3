package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Parity pin for the split-free suite kernel: on every planted edge
  * case, [[RepScanSuiteKernels]] must agree field-for-field with the
  * composed reference form `RepScan(split(trim(text), "\s+"), n)` for
  * all nine widths, plus the joined-length column. The edge cases cover
  * the split/trim contract the byte tokenizer re-implements: ASCII-space
  * trim only, limit −1 semantics (leading/trailing non-space whitespace
  * yields empty edge tokens), empty and all-whitespace inputs,
  * multi-byte UTF-8, and heavy repetition (hash-table grouping + the
  * count/length/lexicographic tie-break).
  */
class RepScanSuiteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cases = Seq(
    "",                              // empty → [""]
    " ",                             // all spaces → trim → [""]
    "\t",                            // non-space ws survives trim → ["",""]
    "a",                             // single token, no grams
    "a b",                           // one 2-gram
    "x y x y x y",                   // count tie-breaks
    "a a a a a a a a a a a a",       // one gram repeated at every width
    "héé wörld héé wörld naïve",     // multi-byte chars: char vs byte len
    "a\tb\nc\u000Bd\fe\rf g",        // every \s separator class
    " leading and trailing ",        // space trim
    "\tlead nonspace",               // leading empty edge token
    "trail nonspace\n",              // trailing empty edge token
    "aa bb aa bb cc aa bb",          // mixed counts
    (1 to 40).map(i => s"w$i").mkString(" "),          // all-unique long
    ((1 to 8).map(i => s"r$i") ++ (1 to 8).map(i => s"r$i")).mkString(" "),
    "ab abc ab abc abcd ab",         // length tie-break
    "b a b a c",                     // lexicographic tie-break at count 2
    "É É é é Ê")                     // case/accents: pure byte order

  test("suite kernel equals split+RepScan composition on all edge cases") {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val toks = split(trim(col("text")), "\\s+")
    val refCols = length(array_join(toks, " ")).cast("long").as("ref_nl") +:
      (2 to 10).map(n => RepScanKernels.repScanCol(toks, n).as(s"ref$n"))
    val suite = RepScanSuiteKernels.repScanSuiteCol(col("text")).as("su")
    val rows = df.select(col("id") +: col("text") +: suite +: refCols: _*)
      .collect()
    rows.foreach { r =>
      val su = r.getAs[Row]("su")
      assert(su.getAs[Long]("nl") == r.getAs[Long]("ref_nl"),
        s"nl mismatch on ${r.getAs[String]("text")}")
      (2 to 10).foreach { n =>
        val a = su.getAs[Row](s"sc$n")
        val b = r.getAs[Row](s"ref$n")
        assert(a == b,
          s"width $n mismatch on '${r.getAs[String]("text")}': $a vs $b")
      }
    }
  }

  test("suite kernel equals composition on the real corpus (sf0.001)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = split(trim(col("text")), "\\s+")
    val refCols = length(array_join(toks, " ")).cast("long").as("ref_nl") +:
      (2 to 10).map(n => RepScanKernels.repScanCol(toks, n).as(s"ref$n"))
    val suite = RepScanSuiteKernels.repScanSuiteCol(col("text")).as("su")
    val bad = df.select(col("doc_id") +: suite +: refCols: _*)
      .collect()
      .filter { r =>
        val su = r.getAs[Row]("su")
        su.getAs[Long]("nl") != r.getAs[Long]("ref_nl") ||
          (2 to 10).exists(n =>
            su.getAs[Row](s"sc$n") != r.getAs[Row](s"ref$n"))
      }
    assert(bad.isEmpty, s"${bad.length} corpus docs diverge")
  }
}
