package graft.operators

import org.apache.spark.sql.SparkSession

/** Scoped enablement of Catalyst's runtime bloom-filter join pruning
  * (`InjectRuntimeFilter`, Spark 3.3+): when one join side carries a
  * selective filter, the optimizer aggregates a bloom filter over its
  * join keys and pushes a `bloom_filter_might_contain` predicate into
  * the OTHER side's scan — rows that cannot match die before the
  * shuffle. At 100 TB this is the difference between shuffling the
  * whole fact table and shuffling the ~matching sliver; it composes
  * with (and fires precisely when) broadcast pruning can't, i.e. on
  * shuffle joins whose dimension side is past the broadcast threshold.
  *
  * Spark gates injection on size estimates tuned for cluster scale
  * (application side ≥ 10 GB by default), so small-SF runs never
  * trigger it silently; this helper pins the gates for a scope so the
  * behavior is testable — RuntimeFilterSpec proves injection happens
  * and that results are bit-identical with pruning on and off.
  */
object RuntimeFilters {

  val Enabled = "spark.sql.optimizer.runtime.bloomFilter.enabled"
  val AppSideThreshold =
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
  val CreationSideThreshold =
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"

  /** Run `body` with bloom-filter pruning force-enabled (size gates
    * lowered to `appSideMin`/`creationMax`), restoring prior values
    * after — the session is shared, so scoping is not optional.
    */
  def withBloomPruning[T](spark: SparkSession,
                          appSideMin: String = "0",
                          creationMax: String = "100MB")(body: => T): T = {
    val keys = Seq(Enabled, AppSideThreshold, CreationSideThreshold)
    val prior = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(Enabled, "true")
    spark.conf.set(AppSideThreshold, appSideMin)
    spark.conf.set(CreationSideThreshold, creationMax)
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
