package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Config for the roster→Moodle normalization (reference defaults at
  * `app.py:29-47`).
  */
final case class MoodleConfig(
    courseField: String = "CURSO-101",
    type1Value: Int = 1,
    profileFieldName: String = "profile_field_rut",
    passwordPattern: String = "{username}{year}",
    passwordYear: Int = 2025)

/** The heart of the reference: normalize a raw roster into the 8-column
  * Moodle-import frame (`normalize_excel_to_moodle_csv`, `app.py:225-274`).
  *
  * Input schema: `rut, nombres, apellidos, email` string columns (extra
  * columns are ignored). Output columns, in the contractual order
  * (`app.py:269-271`): `username, password, firstname, lastname, email,
  * <profileField>, type1, course1`.
  *
  * The whole transform is one narrow projection — no shuffle, fully
  * whole-stage-codegen'd, scales linearly with input splits.
  */
object MoodleNormalize {

  def apply(roster: DataFrame, cfg: MoodleConfig = MoodleConfig()): DataFrame = {
    // P2 — keep rows with both rut and nombres present (`app.py:247`).
    val participants = roster.filter(col("rut").isNotNull && col("nombres").isNotNull)

    val username = buildUsername(col("nombres"), col("apellidos"))
    participants.select(
      username.as("username"),
      buildPassword(cfg.passwordPattern, cfg.passwordYear,
        username, trim(col("rut")), selectSingleEmail(col("email"))).as("password"),
      // firstname: first token of title-cased nombres (`app.py:251-252`)
      firstToken(titleCase(trim(col("nombres")))).as("firstname"),
      // lastname: all of title-cased apellidos (`app.py:253`)
      titleCase(trim(col("apellidos"))).as("lastname"),
      selectSingleEmail(col("email")).as("email"),
      trim(col("rut")).as(cfg.profileFieldName),
      lit(cfg.type1Value).as("type1"),
      lit(cfg.courseField).as("course1"))
  }
}
