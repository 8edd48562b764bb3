package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Ground truth for the directional containment join: planted
  * contained-in-wrapper pairs that Jaccard misses, directionality, and
  * the no-false-positive side.
  */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plantedDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a paragraph inside a much larger wrapper is found A→B (not B→A), " +
       "exactly where Jaccard fails") {
    val para = (1 to 12).map(i => s"p$i").mkString(" ")
    val wrapper = (1 to 40).map(i => s"w$i").mkString(" ") + " " + para +
      " " + (41 to 80).map(i => s"w$i").mkString(" ")
    val noise = (1 to 30).map(i => s"z$i").mkString(" ")
    val dir = plantedDir(Seq((1L, para), (2L, wrapper), (3L, noise)))
    val pairs = CorpusQueries.dedupContainment(spark, dir)
      .select("a_id", "b_id", "containment")
      .as[(Long, Long, Double)].collect().toList
    assert(pairs.map(p => (p._1, p._2)) == List((1L, 2L))) // directional
    assert(pairs.head._3 == 1.0) // every gram of the paragraph is in the wrapper
    // and the symmetric Jaccard join at 0.5 would NOT pair them:
    // |A∩B| = 10 grams, |A∪B| ≈ 10 + 78 + 2 → J ≈ 0.1
  }

  test("near-threshold: containment ≥ 4/5 kept, below dropped") {
    // A has 10 grams (12 tokens); share exactly 8 of them -> c = 0.8 kept
    val a = (1 to 12).map(i => s"a$i").mkString(" ")
    // b contains tokens a1..a10 contiguously (8 shared grams of A's 10)
    // plus bulk; a's grams a9..a12 tail is broken
    val b = (1 to 10).map(i => s"a$i").mkString(" ") + " " +
      (1 to 30).map(i => s"b$i").mkString(" ")
    val dir = plantedDir(Seq((1L, a), (2L, b)))
    val pairs = CorpusQueries.dedupContainment(spark, dir)
      .select("a_id", "b_id", "containment")
      .as[(Long, Long, Double)].collect().toList
    assert(pairs == List((1L, 2L, 0.8)))

    // break one more gram -> 7/10 < 0.8 -> dropped
    val b2 = (1 to 9).map(i => s"a$i").mkString(" ") + " " +
      (1 to 30).map(i => s"b$i").mkString(" ")
    val dir2 = plantedDir(Seq((1L, a), (2L, b2)))
    assert(CorpusQueries.dedupContainment(spark, dir2).count() == 0)
  }

  test("hot-gram candidate fan-out is clamped: boilerplate-heavy short docs " +
       "generate ZERO candidates instead of O(df) each, and rare-gram pairs " +
       "are still found alongside them") {
    // 120 short docs of PURE shared boilerplate (every gram df = 120 >
    // ContainMaxDf = 20). Pre-clamp, each doc's prefix gram joined all
    // 119 others: ~120·119 candidate rows. Post-clamp: zero.
    val boiler = (1 to 8).map(i => s"hot$i").mkString(" ")
    val hotDocs = (100L to 219L).map(id => (id, boiler))
    // plus one genuine rare-gram containment pair riding alongside
    val para = (1 to 12).map(i => s"p$i").mkString(" ")
    val wrapper = (1 to 40).map(i => s"w$i").mkString(" ") + " " + para
    val dir = plantedDir(hotDocs ++ Seq((1L, para), (2L, wrapper)))

    val grams = graft.operators.Dedup.explodedNgrams(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", n = 3)
    val cands = CorpusQueries.containmentCandidates(grams)
      .as[(Long, Long)].collect().toList
    // the quadratic boilerplate block contributes nothing...
    assert(!cands.exists { case (x, y) => x >= 100L || y >= 100L })
    // ...while rare-gram discovery still surfaces the true pair
    assert(cands.contains((1L, 2L)))
    val pairs = CorpusQueries.dedupContainment(spark, dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toList
    assert(pairs == List((1L, 2L)))
  }
}

/** The sketch algebra behind `source_minhash`: group-level signatures
  * must equal the element-wise min of member signatures (mergeability),
  * and identical gram sets must estimate J = 1.
  */
class SourceMinhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("source signature is the element-wise min of its docs' signatures, " +
       "and identical sources report jaccard 1 in-bounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-srcmh").toString
    val textA = (1 to 30).map(i => s"a$i").mkString(" ")
    val textB = (1 to 30).map(i => s"b$i").mkString(" ")
    Seq((1L, textA, "s1"), (2L, textB, "s1"),
        (3L, textA, "s2"), (4L, textB, "s2"), // s2 = same gram set as s1
        (5L, (1 to 30).map(i => s"c$i").mkString(" "), "s3"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // mergeability: per-source sig == element-wise min over per-doc sigs
    val grams = graft.operators.Dedup.explodedNgrams(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", n = 3,
      keep = Seq("source"))
    val docSigs = graft.operators.Dedup.minhashSignatures(grams, 16)
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("id"), col("source")), "id")
      .select("source", "sig").as[(String, Seq[Long])].collect()
      .groupBy(_._1).map { case (s, gs) =>
        s -> gs.map(_._2).reduce((x, y) => x.zip(y).map(p => math.min(p._1, p._2)))
      }
    val srcSigs = graft.operators.Dedup.minhashSignatures(
      grams.select(col("source").as("id"), col("gh")).distinct(), 16)
      .as[(String, Seq[Long])].collect().toMap
    docSigs.foreach { case (s, merged) => assert(srcSigs(s) == merged, s) }

    val out = CorpusQueries.sourceMinhashSim(spark, dir)
      .select("source_a", "source_b", "jaccard", "in_bounds")
      .as[(String, String, Double, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("s1", "s2")) == ((1.0, 1L))) // identical gram sets
    // zero-overlap pairs never materialize (sparse join — J = 0 by absence)
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")))
    assert(out.values.forall(_._2 == 1L)) // every estimate inside the gate
  }
}

/** The 4×16-band bucket join behind `Multimodal.imageNearDups` must be
  * pigeonhole-COMPLETE: any two 64-bit hashes within Hamming 3 share at
  * least one whole 16-bit band (so banding can only over-generate
  * candidates, never lose a true pair).
  */
object BandingProps extends Properties("Banding") {
  private val pairs: Gen[(Long, Int, Int, Int)] = for {
    h <- Gen.long
    k <- Gen.chooseNum(0, 3)
    b1 <- Gen.chooseNum(0, 63); b2 <- Gen.chooseNum(0, 63); b3 <- Gen.chooseNum(0, 63)
  } yield (h, if (k > 0) b1 else -1, if (k > 1) b2 else -1, if (k > 2) b3 else -1)

  property("hamming<=3 pairs always share a 16-bit band") =
    Prop.forAllNoShrink(pairs) { case (h, b1, b2, b3) =>
      val other = Seq(b1, b2, b3).filter(_ >= 0)
        .foldLeft(h)((acc, b) => acc ^ (1L << b))
      (0 to 3).exists { band =>
        ((h >>> (band * 16)) & 0xFFFFL) == ((other >>> (band * 16)) & 0xFFFFL)
      }
    }
}
