package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the persisted near-dup ledger (the
  * `dedup_ledger_build` layout) — the [[StreamingIndexMaintenance]]
  * contract applied to dedup: ADMITTED arrivals' banded bucket keys
  * are appended as a DELTA segment next to the base ledger, where the
  * probe side picks them up (`base.unionByName(deltaBuckets(...))`
  * feeds [[StreamingLedgerProbe.score]] or the batch probe), so
  * today's arrivals are tomorrow's history without a full re-signature
  * of the corpus. Key computation is the SAME row-local pipeline the
  * streaming probe uses ([[StreamingLedgerProbe.bandKeys]] — one pass
  * typically serves both: probe first, append the admitted survivors).
  *
  * Stateless like the index maintenance: keys are pure row-local
  * projections; exactly-once comes from the file sink's commit log (a
  * replayed micro-batch never re-appends — a duplicated bucket row
  * would only duplicate candidate rows, which the probe's verify
  * dedups, but the commit log makes it moot). The delta is
  * `partitionBy(band, kb)` like the base, so the batch probe's
  * (band, kb) directory pruning covers BOTH segments; compaction folds
  * deltas into the base by re-running `dedup_ledger_build` (or
  * concatenating segments — keys are deterministic functions of the
  * text, so base ∪ delta is row-identical to a cold rebuild over
  * corpus ∪ arrivals, asserted in StreamingLedgerMaintenanceSpec).
  */
object StreamingLedgerMaintenance {

  /** The ledger bucket-row projection lifted onto a stream:
    * (id, key, band, kb) rows, schema-identical to the base segment.
    */
  def keyStream(raw: DataFrame): DataFrame =
    StreamingLedgerProbe.bandKeys(raw)
      .withColumn("kb", graft.queries.ScaleQueries.ledgerKbCol)
      .select(col("doc_id").as("id"), col("key"), col("band"), col("kb"))

  /** Append-only file-sink writer for the delta segment — same
    * partitioning as the base ledger so probe pruning covers it.
    */
  def writer(keys: DataFrame, deltaDir: String,
             checkpointDir: String): DataStreamWriter[Row] =
    keys.writeStream
      .outputMode("append")
      .partitionBy("band", "kb")
      .format("parquet")
      .option("path", deltaDir)
      .option("checkpointLocation", checkpointDir)

  /** The delta segment as a batch frame for the probe side; an absent
    * or not-yet-committed delta reads as an empty frame of the base's
    * schema, so `base.unionByName(deltaBuckets(...))` is always valid.
    */
  def deltaBuckets(spark: SparkSession, deltaDir: String,
                   like: DataFrame): DataFrame = {
    val hasData = new java.io.File(deltaDir, "_spark_metadata").exists()
    if (hasData) spark.read.schema(like.schema).parquet(deltaDir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], like.schema)
  }
}
