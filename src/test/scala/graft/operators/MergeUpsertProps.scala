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

  // payload columns are Options: NULLs must ride through the row-wise
  // override unchanged (a NULL change column overrides base with NULL)
  private val rows: Gen[Map[Long, (Option[String], Option[Double])]] = Gen.mapOf(for {
    k <- Gen.chooseNum(0L, 30L)
    s <- Gen.oneOf[Option[String]](Some("a"), Some("b"), Some("c"), None)
    d <- Gen.oneOf(Gen.chooseNum(0, 100).map(v => Option(v.toDouble)),
      Gen.const(Option.empty[Double]))
  } yield k -> (s, d))

  property("equals map-override base ++ changes on unique-keyed inputs") =
    Prop.forAllNoShrink(rows, rows) { (base, changes) =>
      import spark.implicits._
      def df(m: Map[Long, (Option[String], Option[Double])]) =
        m.toSeq.map { case (k, (s, d)) => (k, s, d) }.toDF("k", "s", "d")
      val got = Relational.mergeUpsert(df(base), df(changes), Seq("k"))
        .as[(Long, Option[String], Option[Double])].collect()
        .map { case (k, s, d) => k -> (s, d) }.toMap
      val want = base ++ changes
      (got == want) :| s"got=$got want=$want"
    }
}
