package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketchOf(xs: Seq[Long], k: Int): KmvSketch = {
    val agg = new KmvAgg(k)
    val b = xs.foldLeft(agg.zero)(agg.reduce)
    agg.finish(b)
  }

  test("below capacity the sketch is the exact distinct set (flipped order)") {
    val xs = Seq(5L, -3L, 5L, 7L, -3L, Long.MinValue)
    val sk = sketchOf(xs, k = 16)
    assert(!sk.full)
    assert(sk.vals == xs.distinct.map(_ ^ Long.MinValue).sorted)
  }

  test("duplicates never occupy slots") {
    val sk = sketchOf(Seq.fill(1000)(42L) ++ Seq(1L, 2L, 3L), k = 8)
    assert(sk.vals.length == 4 && !sk.full)
  }

  test("merge equals sketch of the union, exactly") {
    val agg = new KmvAgg(32)
    val xsA = (0 until 500).map(i => i.toLong * 2654435761L)
    val xsB = (0 until 500).map(i => (i + 250).toLong * 40503L - 7L)
    val bA = xsA.foldLeft(agg.zero)(agg.reduce)
    val bB = xsB.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(bA, bB))
    val direct = sketchOf(xsA ++ xsB, 32)
    assert(merged == direct)
  }

  test("intersection estimate lands within the k=256 error band") {
    // 50k ∪ 50k with a 10k true overlap; hashes via xxhash64 so the
    // estimate is a deterministic constant — assert the actual band.
    val k = 256
    val a = spark.range(0, 50000).select(xxhash64(col("id")).as("h"))
    val b = spark.range(40000, 90000).select(xxhash64(col("id")).as("h"))
    def sk(df: org.apache.spark.sql.DataFrame): KmvSketch = {
      val hs = df.as[Long].collect()
      sketchOf(hs.toSeq, k)
    }
    val (ska, skb) = (sk(a), sk(b))
    assert(ska.full && skb.full)
    val theta = math.min(ska.vals.last, skb.vals.last)
    val common = ska.vals.toSet.intersect(skb.vals.toSet).count(_ < theta)
    val est = common / KmvSketch.frac(theta)
    // theory: σ ≈ |A∩B|/√(k·|A∩B|/|A∪B|) ≈ 2k distinct-sample bound;
    // 25% is > 3σ here — deterministic anyway, the assert pins the band
    assert(math.abs(est - 10000.0) < 2500.0, s"est=$est")
  }

  test("theta_intersect flag holds in the ESTIMATING regime (sources >> k): " +
       "the variance-derived band absorbs the sampling error a fixed 10% " +
       "band could trip on") {
    // 5000 + 5000 texts with a 1000-text true overlap: both sketches are
    // full (k = 1024), p ≈ 1024/9000, so σ(est) ≈ √(1000·(1/p−1)) ≈ 88 —
    // the old max(3, 10%·exact) = 100 gate sits at ~1.1σ (coin-flip
    // across datasets); the 3σ band holds deterministically.
    val dir = java.nio.file.Files.createTempDirectory("theta-est").toString
    val rows =
      (0 until 5000).map(i => (i.toLong, "A", s"document text number $i")) ++
      (0 until 5000).map(i => (10000L + i, "B", s"document text number ${4000 + i}"))
    rows.toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.SketchQueries.thetaIntersect(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 1000L, "planted exact overlap")
    assert(out.head.getLong(3) == 1L, "variance band must hold when full")
  }

  test("theta_intersect query: flag green and exact overlap matches a plain join") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.SketchQueries.thetaIntersect(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) == 1L), "estimate out of tolerance")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("text", "source").distinct()
    val exact = d.as("x").join(d.as("y"),
        col("x.text") === col("y.text") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("sa"), col("y.source").as("sb"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == exact.getOrElse(key, 0L), s"exact mismatch at $key")
    }
  }
}
