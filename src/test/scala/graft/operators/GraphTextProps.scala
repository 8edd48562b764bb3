package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Property-based coverage for the round-3 rewrites: the driver
  * union-find fast path must agree with the distributed min-label loop
  * on arbitrary graphs, and the row-local winnow must equal a direct
  * reference implementation on arbitrary token streams.
  */
object GraphTextProps extends Properties("GraphText") {

  private lazy val spark = TestSpark.spark

  private val graphs: Gen[(List[Long], List[(Long, Long)])] = for {
    n <- Gen.chooseNum(0, 24)
    nodes = (0L until n.toLong).toList
    edges <- if (n < 2) Gen.const(List.empty[(Long, Long)])
      else Gen.listOf(for {
        a <- Gen.chooseNum(0L, n - 1L); b <- Gen.chooseNum(0L, n - 1L)
        if a != b
      } yield (a, b))
  } yield (nodes, edges)

  property("union-find fast path == distributed min-label loop") =
    Prop.forAllNoShrink(graphs) { case (nodes, edges) =>
      import spark.implicits._
      def run(cap: Long) = DupClusters.connectedComponents(
          nodes.toDF("id"), edges.toDF("src", "dst"), maxIter = 25, cap)
        .as[(Long, Long)].collect().toMap
      val fast = run(4_000_000L)
      val dist = run(0L)
      (fast == dist) :| s"fast=$fast dist=$dist"
    }

  // reference winnow: every w-window min over the md5 gram hashes,
  // distinct — computed directly in Scala
  private def refWinnow(tokens: List[String], n: Int, w: Int): Set[String] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val grams = (0 to math.max(tokens.length - n, 0)).map(i =>
      md5hex(tokens.slice(i, i + n).mkString(" ")))
    grams.indices.map(k => grams.slice(k, k + w).min).toSet
  }

  private val tokenDocs: Gen[List[String]] =
    Gen.listOfN(2, Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(6)))
      .map(_.take(40))).map(_.map(_.mkString(" ")))

  property("row-local winnow == direct reference") =
    Prop.forAllNoShrink(tokenDocs) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextAnalysis.winnowFingerprints(df, "doc_id", "text", n = 3, w = 4)
        .select(col("id"), col("fp")).as[(Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> refWinnow(t.trim.split("\\s+").toList, 3, 4)
      }.toMap
      (got == want) :| s"got=$got want=$want"
    }
}
