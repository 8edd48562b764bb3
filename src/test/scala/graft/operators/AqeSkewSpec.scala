package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** AQE is the engine's runtime answer to skew the manual salting
  * operators don't cover: with adaptive execution on (the default), a
  * sort-merge join whose one reducer partition dwarfs the others is
  * split at runtime. This spec plants a hot key and asserts Spark
  * actually marks the join skewed — i.e. the config surface our 100 TB
  * story leans on is live, not aspirational.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a planted hot key: join is marked skew=true at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // key 0 carries 50k left rows with a fat payload; 200 cold keys
      val left = spark.range(0, 60000)
        .select(when(col("id") < 50000, 0L).otherwise(col("id") % 200).as("k"),
          concat(lit("x"), col("id").cast("string"), lit("y" * 64)).as("pad"))
      val right = spark.range(0, 200).select(col("id").as("k"), lit(1L).as("w"))
      val joined = left.join(right, "k")
      assert(joined.collect().length == 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the sort-merge join skewed; plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
