package graft.oracle

import graft.etl.{MoodleConfig, RenderMail}
import graft.fixtures.Fixtures
import graft.functions.Template

/** DuckDB-dialect SQL fragment builders mirroring the engine's operators,
  * used to assemble `SparkEntry.oracleSql`. Kept compositional so each
  * oracle query is built from the same pieces (and the same compiled
  * [[Template]]s) as the Spark plan it checks.
  */
object Duck {

  /** n-th (1-based) whitespace token of a trimmed string, NULL when absent. */
  def tok(x: String, n: Int): String =
    s"string_split_regex(trim($x), '\\s+')[$n]"

  /** Title-case a single token the way Python `.title()` does for alpha words. */
  def titleWord(x: String): String =
    s"(upper(substr($x, 1, 1)) || lower(substr($x, 2)))"

  /** Title-case every whitespace token (≈ `initcap` / Python `.title()`). */
  def titleAll(x: String): String =
    s"array_to_string(list_transform(string_split_regex(trim($x), '\\s+'), w -> ${titleWord("w")}), ' ')"

  /** F3 — first `@`-bearing token after newline→space + `[,\s;]+` split. */
  def selectEmail(x: String): String = {
    val cleaned = s"trim(replace($x, chr(10), ' '))"
    s"coalesce(list_filter(string_split_regex($cleaned, '[,\\s;]+'), t -> contains(t, '@'))[1], $cleaned)"
  }

  /** F2 — lowercase, delete ` .,'"`, strip accents. */
  def normalizeUsername(x: String): String =
    s"strip_accents(translate(lower($x), ' .,''\"', ''))"

  /** F4 — username from nombres/apellidos. */
  def buildUsername(nombres: String, apellidos: String): String =
    normalizeUsername(
      s"(coalesce(${tok(nombres, 1)}, '') || coalesce(${tok(apellidos, 1)}, '') || coalesce(substr(${tok(apellidos, 2)}, 1, 2), ''))")

  /** Python-truthiness NULLIF on the raw value. */
  def nullIfEmpty(x: String): String = s"nullif($x, '')"

  /** Title-cased email local-part (`app.py:299,304`). */
  def localPartTitle(email: String): String =
    titleWord(s"split_part($email, '@', 1)")

  // ------------------------------------------------------- moodle pipeline

  /** Full roster→Moodle oracle query (mirrors `MoodleNormalize`). */
  def moodleNormalizeSql(cfg: MoodleConfig = MoodleConfig()): String = {
    val pw = Template.braces(cfg.passwordPattern).sql(Map(
      "username" -> "username",
      "year"     -> Template.sqlStringLiteral(cfg.passwordYear.toString),
      "rut"      -> "rut_t",
      "email"    -> "email"))
    s"""WITH roster AS (${Fixtures.rosterSql}),
participants AS (SELECT * FROM roster WHERE rut IS NOT NULL AND nombres IS NOT NULL),
stage AS (
  SELECT
    ${buildUsername("nombres", "apellidos")} AS username,
    ${selectEmail("email")} AS email,
    trim(rut) AS rut_t,
    nombres, apellidos
  FROM participants)
SELECT
  username,
  strip_accents($pw) AS password,
  ${titleWord(tok("nombres", 1))} AS firstname,
  ${titleAll("apellidos")} AS lastname,
  email,
  rut_t AS ${cfg.profileFieldName},
  1 AS type1,
  ${Template.sqlStringLiteral(cfg.courseField)} AS course1
FROM stage
ORDER BY ${cfg.profileFieldName}"""
  }

  /** Pre-upload roster validation oracle (mirrors `RosterValidate` over
    * the dirty-roster fixture): per-row error classes + deterministic
    * numeric-suffix username disambiguation.
    */
  def rosterValidateSql: String =
    s"""WITH roster AS (${Fixtures.rosterDirtySql}),
staged AS (
  SELECT rut, nombres, apellidos, email,
    (rut IS NULL OR nombres IS NULL) AS miss,
    CASE WHEN rut IS NOT NULL AND nombres IS NOT NULL THEN trim(rut) END AS rut_t,
    CASE WHEN rut IS NOT NULL AND nombres IS NOT NULL
         THEN ${buildUsername("nombres", "apellidos")} END AS uname
  FROM roster),
flagged AS (
  SELECT *,
    (rut_t IS NOT NULL AND count(*) OVER (PARTITION BY rut_t) > 1) AS dup,
    (uname IS NOT NULL AND count(*) OVER (PARTITION BY uname) > 1) AS coll,
    row_number() OVER (PARTITION BY uname ORDER BY rut_t, email) AS rn
  FROM staged)
SELECT rut, nombres, apellidos, email,
  CAST(miss AS BIGINT) AS missing_required,
  CAST(dup AS BIGINT) AS duplicate_rut,
  uname AS username,
  CAST(coll AS BIGINT) AS username_collision,
  CASE WHEN uname IS NULL THEN NULL
       WHEN rn = 1 THEN uname
       ELSE uname || cast(rn AS STRING) END AS username_final,
  CAST((NOT miss AND NOT dup AND NOT coll) AS BIGINT) AS ok
FROM flagged
ORDER BY coalesce(username_final, ''), coalesce(rut, ''),
  strip_accents(coalesce(nombres, '')), strip_accents(apellidos), email"""

  // --------------------------------------------------- mail normalization

  /** Old-dialect normalization over the old-dialect fixture. */
  def mailUsersOldSql: String =
    s"""WITH src AS (${Fixtures.mailOldSql})
SELECT trim(email) AS email, trim(nombre) AS nombre,
       trim(usuario) AS usuario, trim(contrasena) AS contrasena
FROM src
WHERE length(trim(email)) > 0
ORDER BY usuario"""

  /** Moodle-dialect normalization chained on the Moodle pipeline output. */
  def mailUsersMoodleSql(cfg: MoodleConfig = MoodleConfig()): String = {
    val inner = moodleNormalizeSql(cfg)
    s"""WITH moodle AS ($inner)
SELECT trim(email) AS email,
       coalesce(${nullIfEmpty("trim(trim(firstname) || ' ' || trim(lastname))")},
                ${localPartTitle("trim(email)")}) AS nombre,
       trim(username) AS usuario,
       trim(password) AS contrasena
FROM moodle
WHERE length(trim(email)) > 0
ORDER BY contrasena"""
  }

  /** Fallback-dialect normalization over the fallback fixture. */
  def mailUsersFallbackSql: String =
    s"""WITH src AS (${Fixtures.mailFallbackSql})
SELECT trim(email) AS email,
       coalesce(${nullIfEmpty("trim('')")}, ${localPartTitle("trim(email)")}) AS nombre,
       trim(coalesce(${nullIfEmpty("username")}, split_part(trim(email), '@', 1))) AS usuario,
       '' AS contrasena
FROM src
WHERE length(trim(email)) > 0
ORDER BY email"""

  /** Rendered-mail oracle chained on the moodle mail users. */
  def mailRenderSql(courseName: String, aulaUrl: String,
                    cfg: MoodleConfig = MoodleConfig()): String = {
    val vars = RenderMail.sqlBindings(courseName, aulaUrl)
    s"""WITH users AS (${mailUsersMoodleSql(cfg)})
SELECT email, nombre, usuario, contrasena,
       ${RenderMail.SubjectTemplate.sql(vars)} AS subject,
       ${RenderMail.PreheaderTemplate.sql(vars)} AS preheader,
       ${RenderMail.PlainTemplate.sql(vars)} AS plain_body,
       ${RenderMail.HtmlTemplate.sql(vars)} AS html_body
FROM users
ORDER BY contrasena"""
  }

  /** Capacity-bounded enrolment plan (mirrors `EnrolPlan` over the
    * dirty-roster fixture, orders-as-enrolments ledger, nation-as-course
    * catalog). The validation CTEs are the same text as
    * [[rosterValidateSql]]'s; the anti-join is a NOT EXISTS (DuckDB-1.0
    * dialect-safe spelling of LEFT ANTI). The catalog join is a LEFT
    * join mirroring `EnrolPlan`'s — a candidate whose derived course_id
    * has no catalog row (`nCatalog` < `nCourses`, the deliberate
    * catalog-gap fixture) surfaces as `unassigned` with null
    * course/capacity, so the gate verifies all three statuses.
    */
  def enrolPlanSql(nCourses: Int, nCatalog: Int, capExpr: String): String =
    s"""WITH ${enrolCtes(nCourses, nCatalog, capExpr)}
SELECT course_id, course, capacity, seat,
  CASE WHEN capacity IS NULL THEN 'unassigned'
       WHEN seat <= capacity THEN 'enrolled' ELSE 'waitlist' END AS status,
  username, rut, email
FROM seated
ORDER BY course_id, seat"""

  /** The shared CTE chain `roster → staged → flagged → cand → fresh →
    * courses → seated` used by both [[enrolPlanSql]] and
    * [[enrolAuditSql]] (identical text, so the audit provably rolls up
    * the same plan the gate verifies row-wise).
    */
  private def enrolCtes(nCourses: Int, nCatalog: Int, capExpr: String): String =
    s"""roster AS (${Fixtures.rosterDirtySql}),
staged AS (
  SELECT rut, nombres, apellidos, email,
    (rut IS NULL OR nombres IS NULL) AS miss,
    CASE WHEN rut IS NOT NULL AND nombres IS NOT NULL THEN trim(rut) END AS rut_t,
    CASE WHEN rut IS NOT NULL AND nombres IS NOT NULL
         THEN ${buildUsername("nombres", "apellidos")} END AS uname
  FROM roster),
flagged AS (
  SELECT *,
    (rut_t IS NOT NULL AND count(*) OVER (PARTITION BY rut_t) > 1) AS dup,
    row_number() OVER (PARTITION BY uname ORDER BY rut_t, email) AS rn
  FROM staged),
cand AS (
  SELECT cast(split_part(rut, '-', 1) AS BIGINT) AS custkey,
    cast(split_part(rut, '-', 1) AS BIGINT) % $nCourses AS course_id,
    CASE WHEN rn = 1 THEN uname ELSE uname || cast(rn AS STRING) END
      AS username_final,
    rut, email
  FROM flagged
  WHERE NOT miss AND NOT dup),
fresh AS (
  SELECT * FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE cast(o.o_custkey AS BIGINT) = c.custkey
      AND cast(o.o_orderkey AS BIGINT) % $nCourses = c.course_id)),
courses AS (
  SELECT cast(n_nationkey AS BIGINT) AS course_id, n_name AS course,
    cast($capExpr AS BIGINT) AS capacity
  FROM nation WHERE n_nationkey < $nCatalog),
seated AS (
  SELECT course_id, course, capacity,
    cast(row_number() OVER (PARTITION BY course_id ORDER BY username_final)
      AS BIGINT) AS seat,
    username_final AS username, rut, email
  FROM fresh LEFT JOIN courses USING (course_id))"""

  /** Per-course audit rollup over the SAME plan CTEs as
    * [[enrolPlanSql]]: every roster row's final outcome
    * (enrolled/waitlist/unassigned from the seating plan, `already` =
    * anti-joined-out candidates, `invalid` = validator-rejected) counted
    * per course, catalog re-joined for capacity utilization. Invalid
    * rows whose rut derives no course land in the `-1` bucket (coalesce,
    * not NULL — NULL grouping would order differently in DuckDB vs
    * Spark).
    */
  def enrolAuditSql(nCourses: Int, nCatalog: Int, capExpr: String): String =
    s"""WITH ${enrolCtes(nCourses, nCatalog, capExpr)},
planned AS (
  SELECT course_id,
    CASE WHEN capacity IS NULL THEN 'unassigned'
         WHEN seat <= capacity THEN 'enrolled' ELSE 'waitlist' END AS status
  FROM seated),
already AS (
  SELECT course_id, 'already' AS status FROM cand c
  WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE cast(o.o_custkey AS BIGINT) = c.custkey
      AND cast(o.o_orderkey AS BIGINT) % $nCourses = c.course_id)),
invalid AS (
  -- nullif: DuckDB split_part(NULL,...) yields '' (not NULL), and a
  -- strict cast('') errors; Spark's split(null)[0] is null -> -1 bucket
  SELECT coalesce(cast(nullif(split_part(rut, '-', 1), '') AS BIGINT)
      % $nCourses, -1) AS course_id, 'invalid' AS status
  FROM flagged WHERE miss OR dup),
outcomes AS (
  SELECT * FROM planned
  UNION ALL SELECT * FROM already
  UNION ALL SELECT * FROM invalid),
rollup AS (
  SELECT course_id,
    cast(sum(CASE WHEN status = 'enrolled'   THEN 1 ELSE 0 END) AS BIGINT) AS n_enrolled,
    cast(sum(CASE WHEN status = 'waitlist'   THEN 1 ELSE 0 END) AS BIGINT) AS n_waitlist,
    cast(sum(CASE WHEN status = 'unassigned' THEN 1 ELSE 0 END) AS BIGINT) AS n_unassigned,
    cast(sum(CASE WHEN status = 'already'    THEN 1 ELSE 0 END) AS BIGINT) AS n_already,
    cast(sum(CASE WHEN status = 'invalid'    THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid
  FROM outcomes GROUP BY course_id)
SELECT course_id, course, capacity,
  n_enrolled, n_waitlist, n_unassigned, n_already, n_invalid,
  round(cast(n_enrolled AS DOUBLE) / capacity, 6) AS utilization
FROM rollup LEFT JOIN courses USING (course_id)
ORDER BY course_id"""

  /** W1 — ordinal send plan with remaining-count over the old-dialect users. */
  def sendPlanSql: String =
    s"""WITH users AS ($mailUsersOldSql)
SELECT email, nombre, usuario, contrasena,
       cast(row_number() OVER (ORDER BY email) AS BIGINT) AS idx,
       cast(count(*) OVER () AS BIGINT) AS total,
       cast(count(*) OVER () - row_number() OVER (ORDER BY email) AS BIGINT) AS remaining
FROM users
ORDER BY idx"""
}
