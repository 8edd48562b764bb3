package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (Spark startup is the
  * dominant test cost; suites must not stop it).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val s = SparkSession.builder()
      // local[4, 2]: 2 task attempts, like any real cluster — lets
      // RetryResilienceSpec plant a first-attempt failure and prove the
      // engine's aggregates don't double-count retried partitions
      .master("local[4, 2]")
      .appName("graft-tests")
      .config("spark.sql.warehouse.dir", wh)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$wh/metastore_db;create=true")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosFlag, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    LogHygiene.quietBoundedWindowWarn()
    s
  }
}
