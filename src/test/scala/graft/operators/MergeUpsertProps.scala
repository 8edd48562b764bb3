package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import graft.TestSpark

/** mergeUpsert against its specification: for unique-keyed inputs the
  * result IS the map-override `base ++ changes` — on any random data,
  * including empty sides and disjoint/overlapping key sets.
  */
object MergeUpsertProps extends Properties("MergeUpsert") {

  private lazy val spark = TestSpark.spark

  private val rows: Gen[Map[Long, (String, Double)]] = Gen.mapOf(for {
    k <- Gen.chooseNum(0L, 30L)
    s <- Gen.oneOf("a", "b", "c")
    d <- Gen.chooseNum(0, 100)
  } yield k -> (s, d.toDouble))

  property("equals map-override base ++ changes on unique-keyed inputs") =
    Prop.forAllNoShrink(rows, rows) { (base, changes) =>
      import spark.implicits._
      def df(m: Map[Long, (String, Double)]) =
        m.toSeq.map { case (k, (s, d)) => (k, s, d) }.toDF("k", "s", "d")
      val got = Relational.mergeUpsert(df(base), df(changes), Seq("k"))
        .as[(Long, String, Double)].collect()
        .map { case (k, s, d) => k -> (s, d) }.toMap
      val want = base ++ changes
      (got == want) :| s"got=$got want=$want"
    }
}
