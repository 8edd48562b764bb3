package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.TestSpark

/** S6 (progress sink), streaming rendition: the reference logs
  * "[idx/total]" lines per send (`app.py:338-340`); the engine surfaces
  * the same accounting as StreamingQueryListener progress events —
  * structured, per-micro-batch, with exact input-row counts, and
  * without touching the data path.
  */
class ProgressListenerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("listener observes per-batch input row counts") {
    val seen = new ConcurrentLinkedQueue[Long]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        seen.add(e.progress.numInputRows)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val dir = Files.createTempDirectory("prog-src")
    try {
      val q = spark.readStream.schema("email STRING")
        .option("header", "true").csv(dir.toString)
        .writeStream.format("memory").queryName("prog_q")
        .option("checkpointLocation", Files.createTempDirectory("prog-ck").toString)
        .start()
      try {
        Files.writeString(dir.resolve("b1.csv"), "email\na@x.com\nb@x.com\n")
        q.processAllAvailable()
        Files.writeString(dir.resolve("b2.csv"), "email\nc@x.com\n")
        q.processAllAvailable()
      } finally q.stop()
      // progress events include idle ticks (0 rows); the data batches'
      // counts must appear, totalling the 3 ingested rows
      val counts = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      assert(counts.sum == 3, s"got ${counts.toList}")
      assert(counts.contains(2L) && counts.contains(1L), s"got ${counts.toList}")
    } finally spark.streams.removeListener(listener)
  }
}
