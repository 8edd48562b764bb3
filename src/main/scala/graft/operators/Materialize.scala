package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped strategy for the "materialize ONCE, referenced twice"
  * intermediate frames inside operators (LSH banded buckets, exploded
  * gram sets, winnow fingerprints): without materialization a self-join
  * recomputes the full upstream plan per reference, but unconditional
  * eager checkpointing makes DataFrame *construction* run Spark jobs —
  * wrong for plan-only consumers (explain / PlanAudit) — and pins blocks
  * in the block manager for the session lifetime.
  *
  * Resolved per call from the session conf [[Materialize.Key]]:
  *  - `eager` (default): `localCheckpoint(true)` — jobs run at
  *    construction, lineage truncates, the self-join reads cached blocks.
  *    The right mode for execution paths (Verify / Bench / production).
  *  - `lazy`: `localCheckpoint(false)` — construction stays job-free;
  *    the checkpoint materializes inside the first action (independent
  *    join branches may transiently race-compute a partition, results
  *    unchanged).
  *  - `none`: identity — pure plan, nothing pinned, downstream filters
  *    can push through. Self-joined subtrees WILL recompute if the frame
  *    is ever executed; meant for plan inspection and tests.
  *  - `parquet`: write the frame under a job-scoped temp directory and
  *    read it back — the cluster-scale strategy: nothing pinned in the
  *    block manager, every consumer (including a RESTARTED job) reads a
  *    splittable columnar file, and the rewritten scan restores column
  *    pruning for downstream stage consumers. This is how a 100 TB
  *    multi-stage pipeline (e.g. `hygiene_funnel`) persists stage
  *    boundaries; directories are deleted on JVM exit.
  *
  * Iterative algorithms ([[DupClusters.connectedComponents]]) are exempt:
  * their per-round checkpoint is algorithmically required (the loop reads
  * its own output and the plan would grow O(rounds) deep), so they always
  * checkpoint regardless of this conf.
  */
object Materialize {
  /** Session conf key; values `eager` | `lazy` | `none`. */
  val Key = "spark.graft.materialize"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(Key, "eager") match {
      case "none"    => df
      case "lazy"    => df.localCheckpoint(false)
      case "parquet" => viaParquet(df)
      case _         => df.localCheckpoint(true)
    }

  private def viaParquet(df: DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mat")
    // best-effort cleanup at JVM exit (a long session would otherwise
    // accumulate one stage directory per materialization)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }))
    val path = dir.resolve("frame").toString
    df.write.parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
