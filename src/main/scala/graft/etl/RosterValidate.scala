package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Pre-upload roster validation — the reference's own roadmap item
  * (`/root/reference/README.md:73-74`: "validaciones previas de
  * duplicidad y campos obligatorios"). The reference silently DROPS
  * rows failing the required-field filter (`app.py:247`) and would let
  * two rosters rows that derive the same username
  * ([[MoodleNormalize]]'s F4 at `app.py:201-211`) collide in the
  * generated CSV, which a Moodle import then rejects. This operator is
  * the report a user runs BEFORE normalize: one output row per input
  * row, error classes as 0/1 flags, and a deterministic fix for the
  * only auto-fixable class.
  *
  * Error classes (flags are BIGINT 0/1 so the DuckDB oracle hashes
  * identically):
  *
  *  - `missing_required` — rut or nombres absent: the exact rows
  *    `app.py:247`'s filter drops. Such rows leave the candidate set;
  *    the remaining classes are evaluated over import candidates only.
  *  - `duplicate_rut` — the trimmed rut occurs on more than one
  *    candidate row (a resubmitted/duplicated person; Moodle treats the
  *    profile rut as an identity and the import would collide).
  *  - `username_collision` — the DERIVED username (F4) occurs on more
  *    than one candidate row. Distinct people can legitimately collide
  *    ("José Pérez González" twice), so this class is auto-fixable:
  *    `username_final` appends the row's deterministic 1-based rank
  *    within its collision group (ordered by trimmed rut, then email)
  *    for every rank ≥ 2 — first occurrence keeps the bare username,
  *    the rest become `username2`, `username3`, … (the Moodle-admin
  *    convention).
  *
  * `ok = 1` means the row imports as-is with no manual action.
  *
  * Scale: two hash-partitioned window passes, both keyed by a
  * validation group (rut / derived username), never a global window —
  * group sizes are bounded by collision multiplicity, so the operator
  * holds at any corpus size; the sequential rank semantics live only
  * INSIDE a collision group, where they are the point.
  */
object RosterValidate {

  def apply(roster: DataFrame): DataFrame = {
    val missing = col("rut").isNull || col("nombres").isNull
    val staged = roster.select(
      col("rut"), col("nombres"), col("apellidos"), col("email"),
      missing.as("miss"),
      when(!missing, trim(col("rut"))).as("rut_t"),
      when(!missing,
        TextFunctions.buildUsername(col("nombres"), col("apellidos"))).as("uname"))

    // Candidate rows carry non-null rut_t/uname; invalid rows fall into
    // the NULL partition of each window and are flag-guarded out.
    val byRut   = Window.partitionBy(col("rut_t"))
    val byUname = Window.partitionBy(col("uname"))
    val rankW   = Window.partitionBy(col("uname")).orderBy(col("rut_t"), col("email"))

    staged
      .withColumn("dup",  col("rut_t").isNotNull && count(lit(1)).over(byRut) > 1)
      .withColumn("coll", col("uname").isNotNull && count(lit(1)).over(byUname) > 1)
      .withColumn("rn", row_number().over(rankW))
      .select(
        col("rut"), col("nombres"), col("apellidos"), col("email"),
        col("miss").cast("long").as("missing_required"),
        col("dup").cast("long").as("duplicate_rut"),
        col("uname").as("username"),
        col("coll").cast("long").as("username_collision"),
        when(col("uname").isNull, lit(null))
          .when(col("rn") === 1, col("uname"))
          .otherwise(concat(col("uname"), col("rn").cast("string")))
          .as("username_final"),
        (!col("miss") && !col("dup") && !col("coll")).cast("long").as("ok"))
  }
}
