package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compaction collapses a many-small-files table without changing its rows") {
    val dir = Files.createTempDirectory("compact").resolve("t").toString
    // 64 splits of 1k rows each -> 64 small files
    spark.range(0, 64000).select(col("id"), (col("id") % 97).as("v"))
      .repartition(64).write.parquet(dir)
    val before = spark.read.parquet(dir).as[(Long, Long)].collect().toSet

    val (nBefore, nAfter) = Compaction.compactParquet(spark, dir, targetBytes = 512 * 1024)
    assert(nBefore == 64)
    assert(nAfter < nBefore, s"no compaction happened: $nBefore -> $nAfter")

    val after = spark.read.parquet(dir).as[(Long, Long)].collect().toSet
    assert(after == before, "compaction changed table contents")
    // and the directory really contains nAfter files now
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == nAfter)
  }

  test("evolved schemas reconcile under mergeSchema; old files read NULL for new columns") {
    val dir = Files.createTempDirectory("evolve").resolve("t").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.mode("append").parquet(dir)

    val merged = Compaction.readMerged(spark, dir)
    assert(merged.columns.toSet == Set("id", "v1", "v2"))
    val rows = merged.orderBy("id")
      .select(col("id"), col("v1"), col("v2")).collect()
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(2))
    assert(rows(1).getLong(0) == 2L && rows(1).getDouble(2) == 9.5)
  }
}
