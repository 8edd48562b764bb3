package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosFlag, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count() // warm
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      println(f"TIMED $name ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
