package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Template

/** F12 — per-row rendering of the four mail artifacts (subject, preheader,
  * plain body, HTML body) from `$var` templates, as the reference does per
  * message inside its send loop (`app.py:342-359`, templates at
  * `app.py:49-167`).
  *
  * Template text is our own; the capability — `$var` substitution over the
  * placeholder set {nombre, usuario, contrasena, aula_url, nombre_curso,
  * preheader} — matches the reference. Rendering is a pure projection
  * (codegen'd `concat`), so it fuses with upstream normalization into one
  * stage; the oracle SQL for the same render is generated from the SAME
  * compiled template via [[Template.sql]], so plan and oracle cannot drift.
  */
object RenderMail {

  val SubjectTemplate: Template =
    Template.dollar("Tus credenciales — Aula $nombre_curso")

  val PreheaderTemplate: Template =
    Template.dollar("Tu acceso al Aula Virtual. Usuario: $usuario.")

  val PlainTemplate: Template = Template.dollar(
    """Hola $nombre,
      |
      |Estas son tus credenciales de acceso al Aula Virtual ($nombre_curso).
      |
      |Usuario: $usuario
      |Contrasena: $contrasena
      |
      |Acceso: $aula_url
      |
      |Recomendacion: cambia tu contrasena al iniciar sesion.
      |
      |Saludos,
      |Equipo Aula Virtual""".stripMargin)

  val HtmlTemplate: Template = Template.dollar(
    """<!DOCTYPE html>
      |<html lang="es"><head><meta charset="UTF-8"><title>Credenciales</title></head>
      |<body style="font-family:Arial,sans-serif;background:#f4f7fb;margin:0;padding:24px;">
      |<div style="display:none;">$preheader</div>
      |<div style="max-width:640px;margin:auto;background:#fff;border-radius:12px;padding:24px;">
      |<h1 style="font-size:20px;">Aula Virtual</h1>
      |<p>Curso: <strong>$nombre_curso</strong></p>
      |<p>Hola <strong>$nombre</strong>, estas son tus credenciales:</p>
      |<p>Usuario: <code>$usuario</code><br>Contrasena: <code>$contrasena</code></p>
      |<p><a href="$aula_url">Acceder al Aula</a></p>
      |<p style="font-size:12px;color:#6b7280;">Enlace directo: $aula_url</p>
      |</div></body></html>""".stripMargin)

  /** Bind the standard variable set for a mail-user frame. */
  def bindings(courseName: String, aulaUrl: String): Map[String, Column] = {
    val base = Map(
      "nombre"       -> col("nombre"),
      "usuario"      -> col("usuario"),
      "contrasena"   -> col("contrasena"),
      "aula_url"     -> lit(aulaUrl),
      "nombre_curso" -> lit(courseName))
    base + ("preheader" -> PreheaderTemplate.column(base))
  }

  /** SQL-side bindings mirroring [[bindings]] for the DuckDB oracle. */
  def sqlBindings(courseName: String, aulaUrl: String): Map[String, String] = {
    val base = Map(
      "nombre"       -> "nombre",
      "usuario"      -> "usuario",
      "contrasena"   -> "contrasena",
      "aula_url"     -> Template.sqlStringLiteral(aulaUrl),
      "nombre_curso" -> Template.sqlStringLiteral(courseName))
    base + ("preheader" -> PreheaderTemplate.sql(base))
  }

  /** Append `subject`, `preheader`, `plain_body`, `html_body` columns to a
    * normalized mail-user frame.
    */
  def apply(users: DataFrame, courseName: String, aulaUrl: String): DataFrame = {
    val vars = bindings(courseName, aulaUrl)
    users
      .withColumn("subject", SubjectTemplate.column(vars))
      .withColumn("preheader", PreheaderTemplate.column(vars))
      .withColumn("plain_body", PlainTemplate.column(vars))
      .withColumn("html_body", HtmlTemplate.column(vars))
  }
}
