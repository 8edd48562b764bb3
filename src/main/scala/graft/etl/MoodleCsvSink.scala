package graft.etl

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame

/** S4 — the Moodle-import CSV sink (`moodle.to_csv(path, index=False,
  * encoding="utf-8")`, `app.py:273`): ONE file, UTF-8, header row,
  * contractual column order, source row order preserved.
  *
  * Moodle ingests a single file, so the single-partition write is the
  * contract, not a scale bug — rosters are human-sized. The engine-scale
  * path is the plain partitioned `df.write` everywhere else.
  */
object MoodleCsvSink {

  /** Write and return the path of the single CSV file produced. */
  def write(df: DataFrame, outPath: String): Path = {
    val tmp = Files.createTempDirectory("moodle_csv").toString
    df.coalesce(1)
      .write.option("header", "true").option("encoding", "UTF-8")
      .mode("overwrite").csv(tmp)
    val listing = Files.list(Paths.get(tmp))
    val part = try {
      listing.toArray.map(_.toString).filter(p => p.endsWith(".csv")) match {
        case Array(one) => Paths.get(one)
        case other => throw new IllegalStateException(
          s"expected exactly one part file, got ${other.length}")
      }
    } finally listing.close()
    val target = Paths.get(outPath)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    Files.move(part, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    target
  }
}
