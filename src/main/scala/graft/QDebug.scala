package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DupClusters, TextAnalysis}

/** Scratch phase-timer for the dup_clusters pipeline (dev tool). */
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
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val wf = t("winnow+ckpt") {
        TextAnalysis.winnowFingerprints(d, "doc_id", "text", n = 3, w = 4)
          .join(d.select(col("doc_id").as("id"), col("source")), "id")
          .localCheckpoint(true)
      }
      val right = wf.select(col("id").as("bid"), col("fp").as("bfp"),
        col("source").as("bsource"))
      val edges = t("edges") {
        wf.join(right,
            col("source") === col("bsource") && col("fp") === col("bfp") &&
              col("id") < col("bid"))
          .select(col("id").as("src"), col("bid").as("dst")).distinct()
          .localCheckpoint(true)
      }
      println("edges rows " + edges.count())
      t("components") {
        DupClusters.connectedComponents(d.select(col("doc_id").as("id")), edges).count()
      }
      // variant B: driver union-find over collected edges, result joined back
      t("components-uf") {
        import spark.implicits._
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        edges.select(col("src"), col("dst")).as[(Long, Long)].collect().foreach {
          case (a, b) =>
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val m = parent.keys.map(k => k -> find(k)).toMap
        val mapDf = m.toSeq.toDF("id", "root")
        d.select(col("doc_id").as("id"))
          .join(broadcast(mapDf), Seq("id"), "left")
          .select(col("id"), coalesce(col("root"), col("id")).as("cluster_id"))
          .count()
      }
    }
    spark.stop()
  }
}
