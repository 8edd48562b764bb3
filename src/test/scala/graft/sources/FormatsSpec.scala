package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Source/sink format coverage: the engine's frames round-trip through
  * every columnar/line format Spark ships (parquet is the native corpus
  * format; JSON lines, ORC and CSV are the interchange paths). Schema
  * fidelity notes: CSV is stringly (needs an explicit schema on read);
  * JSON preserves longs/doubles but not timestamps without options; ORC
  * and parquet are full-fidelity.
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample = Tables.events(spark, "/root/testdata/sf0.001")
    .select("event_id", "user_id", "event_type", "value", "ts_us")

  test("json lines round-trip preserves values") {
    val dir = Files.createTempDirectory("fmt_json").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == sample.count())
    val a = sample.agg(sum("value"), sum("ts_us")).head()
    val b = back.agg(sum("value"), sum("ts_us")).head()
    assert(a.getDouble(0) == b.getDouble(0) && a.getLong(1) == b.getLong(1))
  }

  test("orc round-trip is schema-identical") {
    val dir = Files.createTempDirectory("fmt_orc").toString
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == sample.schema)
    assert(back.count() == sample.count())
  }

  test("xml round-trip via Spark 4's native XML datasource") {
    val dir = Files.createTempDirectory("fmt_xml").toString
    sample.write.mode("overwrite")
      .option("rootTag", "events").option("rowTag", "event")
      .format("xml").save(dir)
    val back = spark.read.schema(sample.schema)
      .option("rowTag", "event").format("xml").load(dir)
    assert(back.schema == sample.schema)
    assert(back.count() == sample.count())
    val a = sample.agg(sum("value"), sum("ts_us")).head()
    val b = back.agg(sum("value"), sum("ts_us")).head()
    assert(a.getDouble(0) == b.getDouble(0) && a.getLong(1) == b.getLong(1))
  }

  test("csv round-trip with explicit schema recovers typed values") {
    val dir = Files.createTempDirectory("fmt_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(sample.schema)
      .option("header", "true").csv(dir)
    assert(back.schema == sample.schema)
    val a = sample.orderBy("event_id").collect()
    val b = back.orderBy("event_id").collect()
    assert(a.sameElements(b))
  }
}
