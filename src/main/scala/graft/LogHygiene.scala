package graft

/** Targeted log-level hygiene for the engine's entry points.
  *
  * Every unpartitioned window in the query surface runs over a frame
  * that is STRUCTURALLY bounded before the window (k-row limits,
  * grouped histograms whose key cardinality is capped by `round(·,6)`,
  * rank-limit pushdowns) — audited query-by-query, and enforced by
  * `GlobalWindowAuditSpec`, which fails the build if a NEW doc-scale
  * unpartitioned WindowExec ever appears. The per-plan
  * "No Partition Defined for Window operation" WARN is therefore pure
  * noise here: hundreds of lines per Verify/Bench run that drown the
  * output channels a real regression would surface in. Silence exactly
  * that logger (not the level, not the package): the spec is the guard,
  * the log is not.
  */
object LogHygiene {
  def quietBoundedWindowWarn(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // The iterative operators now UNPERSIST each superseded round's
    // localCheckpoint (Coreset.kCenter, DupClusters loop — guide §5);
    // Spark logs an unconditional WARN per unpersist reminding that a
    // truncated-lineage RDD cannot be recomputed. Here that is the
    // point: the released frames are provably dead (the release runs
    // only after the next round's checkpoint materializes), enforced by
    // CheckpointReleaseSpec. The warning's logger is the RDD subclass.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
  }
}
