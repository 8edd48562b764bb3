package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Ground truth for the frontier/statistics operators: a brute-force
  * dominance replay for the skyline, a BigInt OLS replay for the
  * regression, an exact A-Res replay (JVM md5) for the weighted sample,
  * and the sketch-error bound for the HLL rollup.
  */
class FrontierQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("pareto_front equals the O(n²) dominance scan") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_size", "p_retailprice")
      .as[(Long, Int, Double)].collect()
    val brute = parts.filter { case (_, s, p) =>
      !parts.exists { case (_, s2, p2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s) }
    }.map(_._1).toSet
    val got = FrontierQueries.paretoFront(spark, sf)
      .select("p_partkey").as[Long].collect().toSet
    assert(got == brute && got.nonEmpty)
  }

  test("regr_per_group matches a BigInt OLS replay, and r ∈ [-1, 1]") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/supplier.parquet"),
        $"l_suppkey" === $"s_suppkey")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        $"s_nationkey" === $"n_nationkey")
      .select($"n_name", $"l_quantity".cast("long"),
        org.apache.spark.sql.functions.round($"l_extendedprice" * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    val want = rows.groupBy(_._1).map { case (nation, g) =>
      val n = BigInt(g.length)
      val sx = g.map(r => BigInt(r._2)).sum; val sy = g.map(r => BigInt(r._3)).sum
      val sxy = g.map(r => BigInt(r._2) * BigInt(r._3)).sum
      val sxx = g.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      nation -> math.round(slope * 1e6) / 1e6
    }
    val got = FrontierQueries.regrPerGroup(spark, sf)
      .select("n_name", "slope", "r").as[(String, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (nation, slope, r) =>
      assert(slope == want(nation), nation)
      assert(r >= -1.0 && r <= 1.0, nation)
    }
  }

  test("sample_weighted is the exact top-k of the A-Res keys (md5 replay) " +
       "and is deterministic") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      math.pow(u, 1.0 / w)
    }
    val want = docs.map { case (id, w) => (key(id, w), id) }
      .sortBy { case (k, id) => (-k, id) }.take(FrontierQueries.WSampleK)
      .map(_._2).toSet
    val got = FrontierQueries.sampleWeighted(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    val again = FrontierQueries.sampleWeighted(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got)
  }

  test("hll_rollup: weekly union of daily sketches lands within the gate " +
       "on every week (flag all 1), exact counts match a direct distinct") {
    val out = FrontierQueries.hllRollup(spark, sf)
      .select("week", "exact_users", "in_bounds")
      .as[(java.sql.Date, Long, Long)].collect()
    assert(out.length >= 4) // 30 days span ≥4 ISO weeks
    assert(out.forall(_._3 == 1L))
    val truth = graft.sources.Tables.events(spark, sf)
      .selectExpr("cast(date_trunc('week', ts) AS DATE) AS w", "user_id")
      .distinct().groupBy("w").count()
      .as[(java.sql.Date, Long)].collect().toMap
    out.foreach { case (w, exact, _) => assert(truth(w) == exact, w) }
  }
}
