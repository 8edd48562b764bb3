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

  /** Release handle for a frame returned by [[apply]] (or a bare
    * `localCheckpoint`): a thunk that unpersists the checkpoint's
    * pinned blocks. Iterative operators ([[Coreset.kCenter]],
    * [[DupClusters.connectedComponents]]) re-materialize a corpus-sized
    * frame every round; without an explicit release every superseded
    * round's blocks stay pinned in the block manager for the session
    * lifetime — k corpus-sized RDDs per call at 100 TB (guide §5:
    * unpersist when done). Callers must invoke the thunk only once the
    * frame is DEAD (a localCheckpointed frame has no lineage left to
    * recompute from). No-op for plans that pin nothing (`none`,
    * `parquet`, or any non-checkpoint frame).
    */
  def releaseHandle(df: DataFrame): () => Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        () => { lr.rdd.unpersist(blocking = false); () }
      case _ => () => ()
    }

  /** Evaluate two INDEPENDENT frame-building thunks concurrently and
    * return both results — guide §2.6 (overlap independent jobs): an
    * audit query whose truth side and found side are separate blocking
    * materialization chains otherwise runs them back to back, leaving
    * the cluster idle through each chain's scheduling tail. The second
    * thunk runs on a fresh driver thread (created HERE, so Spark's
    * inheritable thread-locals — active session, job group/description —
    * carry over from the caller); the first runs on the caller's
    * thread. Results are unchanged: each chain computes exactly the
    * frames it computed serially, and Spark's scheduler interleaves
    * their jobs' tasks. Exceptions from either thunk propagate (the
    * background one first, after both finish — never swallowed).
    *
    * Use ONLY for thunks with no data dependency on each other; a
    * dependent pair would still be correct (lazy frames) but would
    * silently serialize and pay the thread for nothing.
    */
  def par2[A, B](a: => A, b: => B): (A, B) = {
    val boxB = new java.util.concurrent.atomic.AtomicReference[Either[Throwable, B]]
    val t = new Thread(() => boxB.set(
      try Right(b) catch { case e: Throwable => Left(e) }),
      "graft-materialize-par2")
    t.setDaemon(true)
    t.start()
    val ra = a
    t.join()
    boxB.get() match {
      case Right(rb) => (ra, rb)
      case Left(e)   => throw e
    }
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
