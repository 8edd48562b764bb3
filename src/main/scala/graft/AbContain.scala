package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Materialize}
import graft.queries.CorpusQueries

/** Throwaway A/B: dedup_contain verify stage — explode-join-aggregate
  * (shape A, current) vs row-local array_intersect over pre-collected
  * per-doc gram arrays (shape B). Bench methodology: warm at sf0.001 +
  * sf0.1, two timed passes each, per-shape min.
  */
object AbContain {
  private def docs(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")

  private def shapeA(spark: SparkSession, dir: String): DataFrame =
    CorpusQueries.dedupContainment(spark, dir)

  private def shapeB(spark: SparkSession, dir: String): DataFrame = {
    val grams = Materialize(Dedup.explodedNgrams(docs(spark, dir), "doc_id", "text", n = 3))
    val cands = CorpusQueries.containmentCandidates(grams)
    val arrs = grams.groupBy("id")
      .agg(sort_array(collect_list(col("gh"))).as("gs"), count(lit(1)).as("sz"))
    cands
      .join(arrs.select(col("id").as("a_id"), col("gs").as("ga"), col("sz").as("na")), "a_id")
      .join(arrs.select(col("id").as("b_id"), col("gs").as("gb")), "b_id")
      .select(col("a_id"), col("b_id"), col("na"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("inter"))
      .filter(col("inter").cast("double") / col("na") >=
        CorpusQueries.ContainNum.toDouble / CorpusQueries.ContainDen)
      .select(col("a_id"), col("b_id"),
        round(col("inter").cast("double") / col("na"), 6).as("containment"))
      .orderBy("a_id", "b_id")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosFlag, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
    }
    // warm both shapes
    shapeA(spark, "/root/testdata/sf0.001").count()
    shapeB(spark, "/root/testdata/sf0.001").count()
    shapeA(spark, sf).count(); shapeB(spark, sf).count()
    val a = (1 to 2).map(_ => time(shapeA(spark, sf))).min
    val b = (1 to 2).map(_ => time(shapeB(spark, sf))).min
    // equivalence check
    val ra = shapeA(spark, sf).collect().map(_.toString).sorted
    val rb = shapeB(spark, sf).collect().map(_.toString).sorted
    println(f"AB_CONTAIN shapeA=$a%.2f s shapeB=$b%.2f s equal=${ra.sameElements(rb)}")
    spark.stop()
  }
}
