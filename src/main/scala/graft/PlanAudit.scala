package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch: per-query physical-plan stats (exchanges, joins, scans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosFlag, "true")
      // plan-only consumer: keep operator-internal materialization out of
      // DataFrame construction (no jobs, no pinned blocks)
      .config(graft.operators.Materialize.Key, "none")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(p).length
        println(f"AUDIT $name%-22s ex=${c("Exchange ")}%2d smj=${c("SortMergeJoin")}%2d bhj=${c("BroadcastHashJoin")}%2d bnlj=${c("BroadcastNestedLoopJoin")}%2d cart=${c("CartesianProduct")}%2d win=${c("Window")}%2d scans=${c("Scan parquet")}%2d")
      } catch { case e: Exception => println(s"AUDIT $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
