package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Partition-layout discipline: a date-partitioned write plus a
  * partition-pruned read is how a 100 TB event store avoids touching
  * 99% of its files. The spec asserts the filter lands in the scan's
  * PartitionFilters (metadata pruning), not in a post-scan Filter.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("date-partitioned write is pruned by a partition filter at read") {
    val out = Files.createTempDirectory("events_part").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(out)

    val read = spark.read.parquet(out)
      .filter(col("day") === "2024-01-02")
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("day"), scan)

    // pruning must also be OBSERVABLE: the pruned read touches a strict
    // subset of the days
    val allDays = spark.read.parquet(out).select("day").distinct().count()
    assert(allDays > 1)
    assert(read.select("day").distinct().count() == 1)
  }

  test("dim-filtered join prunes fact partitions at RUNTIME (dynamic partition pruning)") {
    import spark.implicits._
    val out = Files.createTempDirectory("events_dpp").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(out)

    // the filter lives on the DIM side only — static pruning can't see
    // it; the partition subset is known only after the dim is evaluated,
    // which is exactly the 100 TB star-join pattern (fact × filtered
    // calendar). The dim must be a FILE relation with a non-foldable
    // filter — a literal LocalRelation constant-folds and DPP never fires.
    val fact = spark.read.parquet(out)
    val dimPath = Files.createTempDirectory("events_dpp_dim").toString
    fact.select("day").distinct()
      .withColumn("tag",
        when(dense_rank().over(
          org.apache.spark.sql.expressions.Window.orderBy("day")) === 1, "keep")
          .otherwise("drop"))
      .coalesce(1).write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)

    val joined = fact.join(dim.filter(col("tag") === "keep"), "day")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("SubqueryBroadcast"),
      plan.take(3000))
    // and the join really returns only the one day's rows
    assert(joined.select("day").distinct().count() == 1)
  }
}
