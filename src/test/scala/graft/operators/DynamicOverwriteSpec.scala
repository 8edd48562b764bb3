package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Dynamic partition overwrite: re-running one day's pipeline replaces
  * exactly that day's partition and leaves every other partition
  * untouched — the idempotent-backfill contract a daily 100 TB job
  * depends on. (Static overwrite mode would wipe the whole table root;
  * the spec pins the difference.)
  */
class DynamicOverwriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("overwriting one day's partition leaves the others intact") {
    import spark.implicits._
    val out = Files.createTempDirectory("dyn-ovr").toString
    val old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-02"))
        .toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(out)

      // backfill day 1 only: new content, one row
      Seq((9L, "2024-01-01")).toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(out)

      val got = spark.read.parquet(out)
        .select(col("id"), col("day").cast("string"))
        .as[(Long, String)].collect().toSet
      assert(got == Set((9L, "2024-01-01"), (3L, "2024-01-02")), got)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
  }
}
