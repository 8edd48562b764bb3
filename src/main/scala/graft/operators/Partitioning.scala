package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join/aggregation utilities.
  *
  * AQE's skew-join split handles moderate skew transparently; explicit
  * salting is the deterministic remedy when one key dominates so hard
  * that a single reducer would still own it (the classic hot-customer /
  * null-key shapes at 100 TB).
  */
object Partitioning {

  /** Equi-join `big ⋈ small` on `key`, with the big side's rows spread
    * over `salts` sub-keys and the small side replicated once per salt.
    * Result is EXACTLY the plain join (the salt is an internal detail);
    * the shuffle key becomes (key, salt) so a hot key occupies `salts`
    * reducers instead of one.
    *
    * The salt is derived from a deterministic hash of `bigSaltSrc` (not
    * rand()) so retried tasks and resumed runs produce identical
    * partitioning — nondeterministic salting breaks task-retry
    * idempotency on a real cluster.
    */
  def skewSaltedJoin(big: DataFrame, small: DataFrame, key: String,
                     salts: Int, bigSaltSrc: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(bigSaltSrc), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
