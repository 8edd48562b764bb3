package graft
import org.apache.spark.sql.SparkSession

/** Round-18 optimization evidence: dumps `.explain("formatted")` for the
  * queries touched this round into plans/r18/<name>_<tag>.txt.
  *
  *   sbt "runMain graft.PlansR18 <tag> <materializeMode> q1,q2,..."
  *
  * Same contract as [[PlansR17]]: `tag` is `before`/`after`,
  * `materializeMode` feeds [[graft.operators.Materialize.Key]], session
  * confs mirror Bench (local[32], shuffle.partitions=32) so join
  * strategies match the measured plans; data dir sf0.1.
  */
object PlansR18 {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val mode = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosFlag, "true")
      .config(graft.operators.Materialize.Key, mode)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = java.nio.file.Paths.get("plans/r18")
    java.nio.file.Files.createDirectories(out)
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(out.resolve(s"${name}_$tag.txt"), plan)
      println(s"wrote plans/r18/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
