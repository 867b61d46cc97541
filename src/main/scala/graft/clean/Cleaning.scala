package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level cleaning kernel.
  *
  * Ports the semantics of the reference's column-preparation layer
  * (cc_catalog_airflow/dags/provider_api_scripts/common/storage/
  * columns.py:30-118) as codegen-friendly expression chains — no UDFs,
  * so every step stays inside WholeStageCodegen and distributes
  * trivially at any scale.
  */
object Cleaning {

  /** Reference `Column.__sanitize_string` (columns.py:30-42):
    * null-safe; `"` -> `'`; backspace chars dropped; `\` -> `\\`;
    * all whitespace runs collapsed to a single space (the reference
    * achieves this with split()/join, which also trims the ends).
    */
  def sanitizeString(c: Column): Column = {
    val quoted = regexp_replace(c, "\"", "'")
    val noBackspace = regexp_replace(quoted, "\\x08", "")
    // regex replacement strings treat \ specially: four source-level
    // backslashes emit one literal backslash in the output.
    val escaped = regexp_replace(noBackspace, "\\\\", "\\\\\\\\")
    trim(regexp_replace(escaped, "\\s+", " "))
  }

  /** Reference `Column.__enforce_char_limit` (columns.py:44-57):
    * over-limit strings truncate to `limit` chars, or null out when
    * truncation is not allowed (URL columns, columns.py:225-243).
    */
  def enforceCharLimit(c: Column, limit: Int, truncate: Boolean): Column =
    when(length(c) > limit, if (truncate) substring(c, 1, limit) else lit(null))
      .otherwise(c)

  /** Reference `IntegerColumn.prepare_string` (columns.py:70-86):
    * best integer approximation of a numeric string — Python
    * `int(float(v))` truncates toward zero; unparseable input -> null.
    * Sessions run with ANSI off (graft.Sessions), so the double cast
    * is permissive (null on unparseable) like the reference.
    */
  def intCast(c: Column): Column = {
    val d = c.cast("double")
    // beyond-int-range doubles (and ±Infinity) must null out, not wrap
    // via long->int truncation to garbage — the reference's
    // int(float(v)) raises/overflows visibly, never silently wrong.
    when(d.isNull || isnan(d) ||
        d > lit(Int.MaxValue.toDouble) || d < lit(Int.MinValue.toDouble),
      lit(null))
      .otherwise(d.cast("long").cast("int"))
  }

  /** Reference `BooleanColumn.prepare_string` (columns.py:99-118):
    * {'true','True','t','T'} -> "t", {'false','False','f','F'} -> "f",
    * anything else -> null.
    */
  def boolCast(c: Column): Column =
    when(c.isin("true", "True", "t", "T"), "t")
      .when(c.isin("false", "False", "f", "F"), "f")
      .otherwise(lit(null))

  /** Reference `StringColumn.prepare_string` (columns.py:193-206):
    * sanitize then enforce limit (truncating). */
  def prepareString(c: Column, limit: Int): Column =
    enforceCharLimit(sanitizeString(c), limit, truncate = true)

  /** Reference `JSONColumn._sanitize_json_values` (columns.py:131-173):
    * recursively sanitize every leaf string of a semi-structured
    * value. Typed-column variants (the engine's jsonb carriers are
    * MAP<STRING,STRING> and ARRAY<STRING>/ARRAY<STRUCT>): sanitize
    * every value in place; empty containers -> null like the
    * reference's falsy check. */
  def sanitizeJsonMap(m: Column): Column =
    when(m.isNull || size(map_keys(m)) === 0, lit(null))
      .otherwise(transform_values(m, (_, v) => sanitizeString(v)))

  def sanitizeJsonArray(a: Column): Column =
    when(a.isNull || size(a) === 0, lit(null))
      .otherwise(transform(a, v => sanitizeString(v)))

  /** Scala-side twin of [[sanitizeString]] for leaf values inside
    * nested JSON (same replacements, same order). */
  def sanitizeStringScala(s: String): String =
    if (s == null) null
    else s.replace("\"", "'")
      .replaceAll("\\x08", "")
      .replace("\\", "\\\\")
      .replaceAll("\\s+", " ")
      // strip SPACES only (after the \s+ collapse the edges can only
      // hold plain spaces or non-\s control chars): Java's
      // String.trim would also eat control chars <= 0x20, which
      // neither the Column form (Spark trim = spaces) nor the
      // reference's Python .strip() does
      .replaceAll("^ +| +$", "")

  /** Reference `JSONColumn._sanitize_json_values` (columns.py:146-172):
    * recursively sanitize every leaf STRING of a JSON document,
    * depth-capped at `maxDepth` (the reference's recursion_limit=100).
    * Structure, numbers, booleans and nulls pass through; non-JSON
    * input degrades to a sanitized plain string (the reference's
    * non-dict/list branch). This is deliberately a small Scala
    * function applied at the to_json boundary only — the flat typed
    * carriers (MAP/ARRAY columns) keep the pure-Column
    * [[sanitizeJsonMap]]/[[sanitizeJsonArray]] path. */
  def sanitizeJsonValuesScala(json: String, maxDepth: Int = 100): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def walk(v: JValue, depth: Int): JValue = v match {
      case JString(s) => JString(sanitizeStringScala(s))
      case JObject(fields) if depth > 0 =>
        JObject(fields.map { case (k, x) => (k, walk(x, depth - 1)) })
      case JArray(items) if depth > 0 => JArray(items.map(walk(_, depth - 1)))
      // at the cap, remaining subtrees serialize as-is (reference
      // stringifies them; either way recursion stops)
      case other => other
    }
    if (json == null) null
    else {
      try JsonMethods.compact(JsonMethods.render(
        walk(JsonMethods.parse(json), maxDepth)))
      catch { case _: Throwable => sanitizeStringScala(json) }
    }
  }

  private val sanitizeJsonUdf =
    org.apache.spark.sql.functions.udf((s: String, d: Int) =>
      sanitizeJsonValuesScala(s, d))

  /** Column form of [[sanitizeJsonValuesScala]]. */
  def sanitizeJsonString(c: Column, maxDepth: Int = 100): Column =
    sanitizeJsonUdf(c, lit(maxDepth))

  /** Reference `URLColumn.prepare_string` (columns.py:225-243): URLs
    * are *never* truncated — over-limit or invalid -> null. The
    * sanitize-changed-it test means any char the sanitizer would touch
    * invalidates the URL. */
  def prepareUrl(c: Column, limit: Int): Column = {
    val valid = Urls.validateUrlString(c)
    when(sanitizeString(c) =!= c, lit(null))
      .otherwise(enforceCharLimit(valid, limit, truncate = false))
  }
}
