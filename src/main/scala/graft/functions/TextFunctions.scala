package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level re-expressions of the reference's scalar functions
  * (SURVEY.md §2.3). Everything here is built from codegen'd Spark
  * built-ins except accent stripping, which is the custom [[DeAccent]]
  * expression — no black-box UDFs anywhere, so whole-stage codegen and
  * parquet pushdown survive the whole pipeline.
  */
object TextFunctions {

  /** F1 — NFKD accent strip (`app.py:169-173`). */
  def deaccent(c: Column): Column = Accent.deaccent(c)

  /** F2 — username normalization (`app.py:176-187`): lowercase, delete
    * space/dot/comma/quote chars, strip accents.
    */
  def normalizeUsername(c: Column): Column =
    deaccent(translate(lower(c), " .,'\"", ""))

  /** F3 — pick the first token containing `@` after newline→space and
    * splitting on `[,\s;]+`; fall back to the whole cleaned text
    * (`app.py:190-198`). Higher-order `filter` keeps it codegen-able.
    */
  def selectSingleEmail(c: Column): Column = {
    val cleaned = trim(regexp_replace(c, "\n", " "))
    val tokens  = split(cleaned, "[,\\s;]+")
    val withAt  = filter(tokens, t => t.contains("@"))
    coalesce(get(withAt, lit(0)), cleaned)
  }

  /** First whitespace token of a trimmed string, NULL-safe ("" → NULL so
    * callers can coalesce). Mirrors Python `s.split()[0]` (`app.py:205`).
    */
  def firstToken(c: Column): Column =
    get(split(trim(c), "\\s+"), lit(0))

  /** N-th (0-based) whitespace token, NULL when absent. */
  def token(c: Column, n: Int): Column =
    get(split(trim(c), "\\s+"), lit(n))

  /** F4 — `firstToken(nombres) ++ firstToken(apellidos) ++
    * first2(secondToken(apellidos))` then F2 (`app.py:201-211`). Missing
    * tokens contribute empty strings, as in the reference.
    */
  def buildUsername(nombres: Column, apellidos: Column): Column = {
    val raw = concat(
      coalesce(firstToken(nombres), lit("")),
      coalesce(firstToken(apellidos), lit("")),
      coalesce(substring(token(apellidos, 1), 1, 2), lit("")))
    normalizeUsername(raw)
  }

  /** F5 — password from a `{username}{year}{rut}{email}` pattern, then
    * accent-strip (`app.py:214-222`). The pattern is compiled once.
    */
  def buildPassword(pattern: String, year: Int,
                    username: Column, rut: Column, email: Column): Column = {
    val t = Template.braces(pattern)
    deaccent(t.column(Map(
      "username" -> username,
      "year"     -> lit(year.toString),
      "rut"      -> rut,
      "email"    -> email)))
  }

  /** F6 — title-case. Python `str.title()` and `initcap` agree on
    * space-separated alphabetic tokens (divergence on apostrophes is
    * documented in SURVEY.md §2.3 and kept out of oracle fixtures).
    */
  def titleCase(c: Column): Column = initcap(c)

  /** F9 — email local-part. */
  def emailLocalPart(c: Column): Column = split_part(c, lit("@"), lit(1))

  /** Python-truthiness helper: NULL when the RAW string is empty
    * (reference checks `or`-falsiness before stripping, `app.py:304-306`).
    */
  def nullIfEmpty(c: Column): Column = nullif(c, lit(""))
}
