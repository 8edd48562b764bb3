package graft
import org.apache.spark.sql.SparkSession

/** Round-17 optimization evidence: dumps `.explain("formatted")` for the
  * queries touched this round into plans/r17/<name>_<tag>.txt.
  *
  *   sbt "runMain graft.PlansR17 <tag> <materializeMode> q1,q2,..."
  *
  * `tag` is `before`/`after`; `materializeMode` feeds
  * [[graft.operators.Materialize.Key]]:
  *  - `none`  reproduces the pre-round plan for changes that only ADDED
  *    a Materialize boundary (the operator code paths are identical,
  *    the conf switches the materialization off, so the printed plan IS
  *    the before shape);
  *  - `eager` prints the execution shape the bench actually runs —
  *    materialized frames appear as "Scan ExistingRDD", which is the
  *    plan-level proof that an upstream subtree (decode/signature/edge
  *    build) now executes once instead of once per reference.
  * Session confs mirror Bench (local[32], shuffle.partitions=32) so the
  * join strategies match the measured plans; data dir sf0.1.
  */
object PlansR17 {
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
    val out = java.nio.file.Paths.get("plans/r17")
    java.nio.file.Files.createDirectories(out)
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(out.resolve(s"${name}_$tag.txt"), plan)
      println(s"wrote plans/r17/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
