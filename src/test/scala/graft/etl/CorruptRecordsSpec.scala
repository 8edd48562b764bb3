package graft.etl

import java.nio.file.Files
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Malformed-input surface (E4's engine-grade rendition): the reference
  * try/excepts whole files; the engine classifies per ROW via Spark's
  * CSV parse modes — keep-and-tag (PERMISSIVE + corrupt-record column),
  * silently drop (DROPMALFORMED), or abort (FAILFAST).
  */
class CorruptRecordsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def csvFile(lines: String*): String = {
    val dir = Files.createTempDirectory("corrupt")
    Files.writeString(dir.resolve("in.csv"), lines.mkString("\n"))
    dir.toString
  }

  // a wrong-arity row (3 tokens against a 2-column schema) is malformed
  private val path = csvFile(
    "email,nombre",
    "a@x.cl,Ana",
    "b@x.cl,Bob,EXTRA",
    "l@x.cl,Luis")

  private val schema = StructType(Seq(
    StructField("email", StringType), StructField("nombre", StringType),
    StructField("_corrupt", StringType)))

  test("PERMISSIVE keeps malformed rows, tagged in the corrupt-record column") {
    val df = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path).cache()
    try {
      assert(df.count() == 3)
      val bad = df.filter(col("_corrupt").isNotNull)
      assert(bad.count() == 1)
      assert(bad.head().getAs[String]("_corrupt").startsWith("b@x.cl,Bob"))
      assert(df.filter(col("_corrupt").isNull).count() == 2)
    } finally df.unpersist()
  }

  test("DROPMALFORMED yields only the clean rows") {
    val df = spark.read.schema(StructType(schema.dropRight(1)))
      .option("header", "true").option("mode", "DROPMALFORMED").csv(path)
    // collect full rows: DROPMALFORMED can only classify arity against the
    // FULL schema — a pruned projection hands the parser a narrower
    // required schema and the malformed row turns into a read error
    assert(df.collect().map(_.getString(0)).toSet ==
      Set("a@x.cl", "l@x.cl"))
  }

  test("FAILFAST aborts the scan on the malformed row") {
    val df = spark.read.schema(StructType(schema.dropRight(1)))
      .option("header", "true").option("mode", "FAILFAST").csv(path)
    intercept[SparkException](df.collect())
  }
}
