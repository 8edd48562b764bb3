package graft.operators

import org.apache.spark.sql.DataFrame

/** Spill-aware sizing arithmetic: partition counts derived from plan
  * statistics so each shuffle partition lands near a target byte size —
  * the knob that keeps sort/aggregate state inside executor memory at
  * any scale factor instead of spilling (or, the opposite failure,
  * scheduling thousands of empty tasks).
  *
  * AQE's coalescing fixes small-partition overhead after the fact; the
  * explicit computation matters where AQE can't help — choosing the
  * partition count of an explicit `repartition` BEFORE a wide
  * transformation, or sizing `spark.sql.shuffle.partitions` for a job
  * whose first shuffle dominates.
  */
object Sizing {

  /** Catalyst's size estimate for the frame (file sizes at the scan,
    * propagated through the plan). An ESTIMATE — selectivities are
    * heuristic — but the right order of magnitude for sizing decisions.
    */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Partition count so each holds ≈ `targetBytes` of the frame's
    * estimated size, clamped to [1, maxPartitions]. 128 MiB default —
    * the conventional executor-friendly shuffle block size.
    */
  def partitionsFor(df: DataFrame, targetBytes: Long = 128L << 20,
                    maxPartitions: Int = 10000): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val n = (estimatedBytes(df) + targetBytes - 1) / targetBytes
    n.min(maxPartitions).max(1).toInt
  }

  /** Repartition by key with a stats-derived partition count — the
    * explicit pre-shuffle used before wide per-key processing
    * (mapPartitions decode stages, bucketed writes).
    */
  def sizedRepartition(df: DataFrame, keys: Seq[String],
                       targetBytes: Long = 128L << 20): DataFrame =
    df.repartition(partitionsFor(df, targetBytes),
      keys.map(org.apache.spark.sql.functions.col): _*)
}
