package graft
import org.apache.spark.sql.SparkSession
/** Dev sweep: byte-equality of every query under two partition counts. */
object DetSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosFlag, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SWEEP_SF", "/root/testdata/sf0.01")
    var bad = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        def run(p: String) = {
          spark.conf.set("spark.sql.shuffle.partitions", p)
          fn(spark, dir).collect().map(_.toString).toSeq
        }
        val a = run("5"); val b = run("23")
        if (a != b) { println(s"DIVERGED $name"); bad += 1 }
        else println(s"OK $name")
      } catch { case e: Exception => println(s"ERROR $name ${e.getMessage.take(80)}"); bad += 1 }
    }
    println(s"SWEEP done, $bad bad")
    spark.stop()
  }
}
