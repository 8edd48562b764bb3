package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Placeholder-template engine covering both template styles in the
  * reference: `$var` / `${var}` mail templates (`app.py:49-167`, rendered at
  * `app.py:342-359`) and `{placeholder}` password patterns (`app.py:36`,
  * expanded at `app.py:214-222`).
  *
  * A compiled template is a list of literal/variable segments. The SAME
  * compiled form renders three ways:
  *   - [[Template.column]]  → a Spark `concat(...)` Column (codegen'd);
  *   - [[Template.sql]]     → a `'lit' || var || ...` SQL expression that
  *     runs identically on Spark SQL and DuckDB (the oracle);
  *   - [[Template.render]]  → plain Scala, for driver-side previews/tests.
  * One source of truth means the oracle can never drift from the plan.
  */
final case class Template(segments: List[Either[String, String]], varNames: Set[String]) {

  /** Render as a Spark Column from a variable→Column binding. */
  def column(vars: Map[String, Column]): Column = {
    require(varNames.subsetOf(vars.keySet), s"missing vars: ${varNames -- vars.keySet}")
    val parts = segments.collect {
      case Left(litStr) if litStr.nonEmpty => lit(litStr)
      case Right(v)                        => vars(v)
    }
    if (parts.isEmpty) lit("") else concat(parts: _*)
  }

  /** Render as a SQL string-concat expression (Spark SQL ∩ DuckDB dialect). */
  def sql(vars: Map[String, String]): String = {
    require(varNames.subsetOf(vars.keySet), s"missing vars: ${varNames -- vars.keySet}")
    val parts = segments.collect {
      case Left(litStr) if litStr.nonEmpty => Template.sqlStringLiteral(litStr)
      case Right(v)                        => s"(${vars(v)})"
    }
    if (parts.isEmpty) "''" else parts.mkString(" || ")
  }

  /** Plain-Scala render for tests and driver-side previews. */
  def render(vars: Map[String, String]): String = {
    require(varNames.subsetOf(vars.keySet), s"missing vars: ${varNames -- vars.keySet}")
    segments.map { case Left(s) => s; case Right(v) => vars(v) }.mkString
  }
}

object Template {

  private val DollarVar = """\$(?:\{(\w+)\}|(\w+))""".r
  private val BraceVar  = """\{(\w+)\}""".r

  /** Compile a `$var` / `${var}` template (mail-template style). */
  def dollar(tpl: String): Template = compile(tpl, DollarVar)

  /** Compile a `{var}` template (password-pattern style). */
  def braces(tpl: String): Template = compile(tpl, BraceVar)

  private def compile(tpl: String, pattern: scala.util.matching.Regex): Template = {
    val segs = List.newBuilder[Either[String, String]]
    var last = 0
    for (m <- pattern.findAllMatchIn(tpl)) {
      if (m.start > last) segs += Left(tpl.substring(last, m.start))
      val name = (1 to m.groupCount).iterator.map(m.group).find(_ != null).get
      segs += Right(name)
      last = m.end
    }
    if (last < tpl.length) segs += Left(tpl.substring(last))
    val list = segs.result()
    Template(list, list.collect { case Right(v) => v }.toSet)
  }

  /** Escape a Scala string as a single-quoted SQL literal valid in both
    * Spark SQL and DuckDB. Embedded newlines are emitted as `chr(10)` calls
    * so the literal survives any line-based transport.
    */
  def sqlStringLiteral(s: String): String = {
    val pieces = List.newBuilder[String]
    val sb = new StringBuilder
    def flush(): Unit = if (sb.nonEmpty) { pieces += "'" + sb.toString + "'"; sb.clear() }
    s.foreach {
      case '\'' => sb.append("''")
      case '\n' => flush(); pieces += "chr(10)"
      case '\r' => flush(); pieces += "chr(13)"
      case c    => sb.append(c)
    }
    flush()
    val out = pieces.result()
    if (out.isEmpty) "''" else if (out.size == 1) out.head else out.mkString("(", " || ", ")")
  }
}
