package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL helpers mirroring the reference's common/urls.py, made
  * deterministic for an offline engine.
  *
  * The reference's network-dependent pieces (TLS probing at
  * urls.py:111-123, redirect rewriting at urls.py:56-77) become
  * identity/lookup-table behavior here — the reference's own tests
  * mock them the same way (SURVEY.md §7.4.4).
  */
object Urls {

  /** Reference `add_url_scheme` (urls.py:80-95): strip any existing
    * http(s) scheme prefix, prepend the requested scheme, and drop a
    * trailing slash. */
  def addUrlScheme(c: Column, scheme: String = "https"): Column = {
    val stripped = regexp_replace(c, "^https?:/*", "")
    regexp_replace(concat(lit(s"$scheme://"), stripped), "/+$", "")
  }

  /** Offline port of `validate_url_string` (urls.py:16-53): the URL
    * must parse with an http(s) scheme and a host that is either a
    * dotted registered name with a plausible TLD or an IPv4 literal.
    * The live TLS-upgrade probe is replaced by keeping the given
    * scheme (deterministic). Invalid -> null.
    */
  def validateUrlString(c: Column): Column = {
    val host = parse_url(c, lit("HOST"))
    val okScheme = c.rlike("^https?://")
    val okHost = host.rlike("^([0-9]{1,3}\\.){3}[0-9]{1,3}$") ||
      host.rlike("^([a-zA-Z0-9-]+\\.)+[a-zA-Z]{2,}$")
    when(okScheme && okHost, c).otherwise(lit(null))
  }

  /** Offline port of `rewrite_redirected_url` (urls.py:56-77): a
    * deterministic lookup table stands in for following redirects;
    * URLs not in the map pass through unchanged. */
  def rewriteRedirectedUrl(c: Column, redirects: Map[String, String]): Column =
    if (redirects.isEmpty) c
    else {
      val m = map(redirects.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      coalesce(element_at(m, c), c)
    }

  /** urlparse-style projections (ExtractCCLinks.py:172,179-183). */
  def host(c: Column): Column = parse_url(c, lit("HOST"))
  def path(c: Column): Column = parse_url(c, lit("PATH"))
  def query(c: Column): Column = parse_url(c, lit("QUERY"))
}
