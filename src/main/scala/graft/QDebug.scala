package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch phase-timer (dev tool). */
object QDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosFlag, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (_ <- 1 to 2) {
      val prepped = Similarity.prep(
        spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      val queries = prepped.filter(col("id") % 50 === 0)
      val cent = t("kmeans") { Similarity.kmeansCentroids(prepped, k = 16, iters = 2) }
      t("ivf-search") {
        Similarity.knnIvf(queries, prepped, k = 5, nProbe = 4, centroids = Some(cent))
          .orderBy("q_id", "rk").count()
      }
    }
    spark.stop()
  }
}
