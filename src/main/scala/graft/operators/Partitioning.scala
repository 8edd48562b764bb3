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
    require(salts > 0, s"salts must be positive, got $salts")
    val saltCol = "__graft_salt"
    require(!big.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"inputs must not already carry a $saltCol column")
    val saltedBig = big.withColumn(saltCol, pmod(xxhash64(bigSaltSrc), lit(salts)))
    val replicatedSmall = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicatedSmall, Seq(key, saltCol)).drop(saltCol)
  }
}
