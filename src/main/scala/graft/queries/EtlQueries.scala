package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{MailSource, MoodleConfig, MoodleNormalize, RenderMail}
import graft.fixtures.Fixtures
import graft.oracle.Duck

/** Core reference-parity queries (SURVEY.md §2.1-§2.6): the Moodle
  * normalization pipeline, the three mail-source dialects, template
  * rendering, and the ordinal send plan. Every query is paired with a
  * DuckDB oracle assembled from the same compiled templates/fragments.
  *
  * All ORDER BYs are on unique ASCII keys so row order (and therefore the
  * driver's hash) is deterministic in both engines.
  */
object EtlQueries {

  /** Password pattern exercising 3 of the 4 placeholders and giving every
    * row a unique `contrasena` (rut is unique), which downstream queries
    * use as a total order.
    */
  val Cfg: MoodleConfig = MoodleConfig(passwordPattern = "{username}{year}-{rut}")

  val CourseName = "Analitica de Datos 101"
  val AulaUrl    = "https://aula.example.org/"

  def moodleNormalize(spark: SparkSession, dir: String): DataFrame =
    MoodleNormalize(Fixtures.roster(spark, dir), Cfg)
      .orderBy(Cfg.profileFieldName)

  /** Pre-upload validation over the dirty roster (the reference's own
    * roadmap item — README.md:73-74): per-row error classes + the
    * deterministic numeric-suffix username fix. Runs on [[Fixtures
    * .rosterDirty]] so the duplicate-rut class actually fires.
    */
  def rosterValidate(spark: SparkSession, dir: String): DataFrame =
    // Sort keys must be ASCII (verify gotcha: Spark binary UTF-8 vs
    // DuckDB collation diverge on accented letters), so the name
    // tiebreakers enter deaccented; remaining ties are fully identical
    // rows, which hash order-free.
    graft.etl.RosterValidate(Fixtures.rosterDirty(spark, dir))
      .orderBy(coalesce(col("username_final"), lit("")),
        coalesce(col("rut"), lit("")),
        graft.functions.TextFunctions.deaccent(coalesce(col("nombres"), lit(""))),
        graft.functions.TextFunctions.deaccent(col("apellidos")),
        col("email"))

  def mailUsersOld(spark: SparkSession, dir: String): DataFrame =
    MailSource.normalize(Fixtures.mailOld(spark, dir)).orderBy("usuario")

  def mailUsersMoodle(spark: SparkSession, dir: String): DataFrame =
    MailSource.normalize(MoodleNormalize(Fixtures.roster(spark, dir), Cfg))
      .orderBy("contrasena")

  def mailUsersFallback(spark: SparkSession, dir: String): DataFrame =
    MailSource.normalize(Fixtures.mailFallback(spark, dir)).orderBy("email")

  def mailRender(spark: SparkSession, dir: String): DataFrame =
    RenderMail(
      MailSource.normalize(MoodleNormalize(Fixtures.roster(spark, dir), Cfg)),
      CourseName, AulaUrl)
      .orderBy("contrasena")

  /** W1/A2 — 1-based ordinal + remaining count. The global window is the
    * POINT of this operator (strictly sequential delivery, `app.py:338-339`)
    * and is guarded by mail-batch scale; large-scale paths drop order
    * semantics (SURVEY.md §7.4.1).
    */
  def sendPlan(spark: SparkSession, dir: String): DataFrame =
    graft.send.SmtpSink.withOrdinals(
      MailSource.normalize(Fixtures.mailOld(spark, dir)), "email")
      .withColumn("remaining", (col("total") - col("idx")).cast("long"))
      .orderBy("idx")

  /** Course-count and per-course capacity for the enrolment fixture.
    * 7 courses (nation keys 0-6 as the catalog) and capacities 2/4/6 by
    * course_id % 3 — sized so BOTH statuses (enrolled + waitlist) fire
    * at sf0.001 AND sf0.01 after the orders-ledger anti-join thins the
    * candidate set.
    */
  val EnrolCourses = 7
  val EnrolCapacitySql = "2 + (n_nationkey % 3) * 2"

  /** Enrolment execution plan (the reference's roadmap bullets
    * README.md:75-77 — "subir usuarios automáticamente a Moodle",
    * "ejecución de matrícula por curso"): validated roster rows,
    * already-enrolled excluded via LEFT ANTI on orders-as-enrolments,
    * capacity-bounded per-course seating with a deterministic ordinal.
    * The delivery side of the plan is [[graft.send.MoodleApiSink]].
    */
  def enrolPlan(spark: SparkSession, dir: String): DataFrame = {
    val validated = graft.etl.RosterValidate(Fixtures.rosterDirty(spark, dir))
    val custkey = split(col("rut"), "-").getItem(0).cast("long")
    val enrolments = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey").cast("long").as("custkey"),
        (col("o_orderkey").cast("long") % EnrolCourses).as("course_id"))
    val courses = spark.read.parquet(s"$dir/nation.parquet")
      .filter(col("n_nationkey") < EnrolCourses)
      .select(col("n_nationkey").cast("long").as("course_id"),
        col("n_name").as("course"),
        (lit(2) + (col("n_nationkey") % 3) * 2).cast("long").as("capacity"))
    graft.etl.EnrolPlan(validated, custkey % EnrolCourses,
      enrolments, custkey, courses)
      .orderBy("course_id", "seat")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "moodle_normalize"    -> (moodleNormalize _),
    "roster_validate"     -> (rosterValidate _),
    "enrol_plan"          -> (enrolPlan _),
    "mail_users_old"      -> (mailUsersOld _),
    "mail_users_moodle"   -> (mailUsersMoodle _),
    "mail_users_fallback" -> (mailUsersFallback _),
    "mail_render"         -> (mailRender _),
    "send_plan"           -> (sendPlan _))

  val oracle: Map[String, String] = Map(
    "moodle_normalize"    -> Duck.moodleNormalizeSql(Cfg),
    "roster_validate"     -> Duck.rosterValidateSql,
    "enrol_plan"          -> Duck.enrolPlanSql(EnrolCourses, EnrolCapacitySql),
    "mail_users_old"      -> Duck.mailUsersOldSql,
    "mail_users_moodle"   -> Duck.mailUsersMoodleSql(Cfg),
    "mail_users_fallback" -> Duck.mailUsersFallbackSql,
    "mail_render"         -> Duck.mailRenderSql(CourseName, AulaUrl, Cfg),
    "send_plan"           -> Duck.sendPlanSql)
}
