package graft.license

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CC license resolution, ported from the reference's
  * common/licenses/constants.py:3-148 and licenses.py:28-233.
  *
  * All maps are static public CC-license path data. The reference's
  * redirect rewriting (licenses.py:225-233) is a live HTTP call; here
  * it is the identity (offline, deterministic) — the reference's own
  * tests monkeypatch it the same way.
  */
object Licenses {

  val NoVersion = "N/A"

  /** constants.py:3-63 — reversible simple paths. */
  private val simplePaths: Seq[String] = Seq(
    "licenses/by/1.0", "licenses/by/2.0", "licenses/by/2.5",
    "licenses/by/3.0", "licenses/by/4.0",
    "licenses/by-nc/1.0", "licenses/by-nc/2.0", "licenses/by-nc/2.5",
    "licenses/by-nc/3.0", "licenses/by-nc/4.0",
    "licenses/by-nc-nd/2.0", "licenses/by-nc-nd/2.5",
    "licenses/by-nc-nd/3.0", "licenses/by-nc-nd/4.0",
    "licenses/by-nc-sa/1.0", "licenses/by-nc-sa/2.0",
    "licenses/by-nc-sa/2.5", "licenses/by-nc-sa/3.0",
    "licenses/by-nc-sa/4.0",
    "licenses/by-nd/1.0", "licenses/by-nd/2.0", "licenses/by-nd/2.5",
    "licenses/by-nd/3.0", "licenses/by-nd/4.0",
    "licenses/by-sa/1.0", "licenses/by-sa/2.0", "licenses/by-sa/2.5",
    "licenses/by-sa/3.0", "licenses/by-sa/4.0",
    "licenses/devnations/2.0",
    "licenses/nc/1.0", "licenses/nc/2.0/jp",
    "licenses/nc-sa/1.0", "licenses/nc-sa/2.0/jp",
    "licenses/nc-sampling+/1.0",
    "licenses/nd/1.0", "licenses/nd/2.0/jp",
    "licenses/nd-nc/1.0", "licenses/nd-nc/2.0/jp",
    "licenses/sa/1.0", "licenses/sa/2.0/jp",
    "licenses/sampling+/1.0", "licenses/sampling/1.0",
  )

  /** constants.py:65-92 — jurisdiction 2.1 paths (URL -> pair only). */
  private val simpleIrreversiblePaths: Seq[String] = for {
    lic <- Seq("by", "by-nc", "by-nc-nd", "by-nc-sa", "by-nd", "by-sa")
    j <- Seq("au", "es", "jp")
  } yield s"licenses/$lic/2.1/$j"

  /** constants.py:94-106 — special paths, reversible. */
  private val specialCasePaths: Seq[(String, (String, String))] = Seq(
    "licenses/by-nd-nc/1.0" -> ("by-nc-nd", "1.0"),
    "licenses/by-nd-nc/2.0/jp" -> ("by-nc-nd", "2.0"),
    "licenses/publicdomain" -> ("publicdomain", NoVersion),
    "publicdomain/mark/1.0" -> ("pdm", "1.0"),
    "publicdomain/zero/1.0" -> ("cc0", "1.0"),
  )

  /** constants.py:108-113 — special paths, irreversible. */
  private val specialCaseIrreversiblePaths: Seq[(String, (String, String))] =
    Seq("licenses/mark/1.0" -> ("pdm", "1.0"))

  private def pairFromPath(path: String): (String, String) = {
    val parts = path.split("/")
    (parts(1), parts(2))
  }

  /** constants.py `get_license_path_map` — ORDER MATTERS: the resolver
    * scans in insertion order and takes the first substring match
    * (licenses.py:113-121). */
  val licensePathMap: Seq[(String, (String, String))] =
    (simplePaths ++ simpleIrreversiblePaths).map(p => p -> pairFromPath(p)) ++
      specialCasePaths ++ specialCaseIrreversiblePaths

  /** constants.py `get_reverse_license_path_map`, incl. the 2.1 ->
    * unported 2.0 downgrade (constants.py:116-122). */
  val reverseLicensePathMap: Map[(String, String), String] =
    simplePaths.map(p => pairFromPath(p) -> p).toMap ++
      specialCasePaths.map { case (p, pair) => pair -> p }.toMap ++
      Seq("by", "by-nc", "by-nc-nd", "by-nc-sa", "by-nd", "by-sa")
        .map(l => (l, "2.1") -> s"licenses/$l/2.0").toMap

  /** licenses.py:208-222 `_ensure_license_version_string`:
    * N/A passes through; otherwise Python str(float(v)). */
  def ensureVersionString(v: String): Option[String] =
    if (v == null) None
    else if (v == NoVersion) Some(NoVersion)
    else
      try Some(v.trim.toDouble.toString)
      catch { case _: NumberFormatException => None }

  /** licenses.py:225-233 `_build_license_url` with offline
    * (identity) redirect rewriting. */
  def buildLicenseUrl(path: String): String = {
    val trimmed = path.trim.stripPrefix("/").stripSuffix("/")
    s"https://creativecommons.org/$trimmed/"
  }

  /** licenses.py:133-184 `_get_valid_cc_url`: lowercase, force https,
    * require netloc creativecommons.org and a licenses|publicdomain
    * segment. Returns the normalized URL or None. */
  def validCcUrl(licenseUrl: String): Option[String] = {
    if (licenseUrl == null) return None
    val lower = licenseUrl.toLowerCase
    val httpsUrl = "https://" + lower.replaceFirst("^https?:/*", "").replaceFirst("/+$", "")
    val netloc = httpsUrl.stripPrefix("https://").takeWhile(_ != '/')
    if (netloc != "creativecommons.org") None
    else if (httpsUrl.contains("licenses") || httpsUrl.contains("publicdomain"))
      Some(httpsUrl)
    else None
  }

  /** licenses.py:28-83 `get_license_info`: URL-derived info wins;
    * fall back to the (license, version) pair; else (null,null,null).
    */
  def getLicenseInfo(
      licenseUrl: String,
      license: String,
      licenseVersion: String): (Option[String], Option[String], Option[String]) = {
    val fromUrl = infoFromUrl(licenseUrl)
    fromUrl match {
      case (Some(_), _, _) => fromUrl
      case _ if license != null => infoFromPair(license, licenseVersion)
      case _ => (None, None, None)
    }
  }

  /** licenses.py:86-131 `_get_license_info_from_url`. */
  def infoFromUrl(licenseUrl: String): (Option[String], Option[String], Option[String]) =
    validCcUrl(licenseUrl) match {
      case None => (None, None, None)
      case Some(ccUrl) =>
        licensePathMap.find { case (p, _) => ccUrl.contains(p) } match {
          case Some((_, (lic, ver))) => (Some(lic), Some(ver), Some(ccUrl))
          case None => (None, None, None)
        }
    }

  /** licenses.py:187-205 `_get_license_info_from_license_pair`. */
  def infoFromPair(
      license: String,
      version: String): (Option[String], Option[String], Option[String]) =
    ensureVersionString(version) match {
      case None => (None, None, None)
      case Some(v) =>
        reverseLicensePathMap.get((license, v)) match {
          case Some(path) => (Some(license), Some(v), Some(buildLicenseUrl(path)))
          case None => (None, None, None)
        }
    }

  /** Crawl-variant regex resolver (Provider.py:181-209): extract
    * (license, version) from a URL *path*; publicdomain zero -> cc0,
    * mark -> pdm, any other publicdomain slug -> null. Expressed as a
    * pure Column chain (regexp_extract) so it stays in codegen.
    */
  def licenseFromPath(pathCol: Column): (Column, Column) = {
    val p = lower(pathCol)
    val re = "/(licenses|publicdomain)/([a-z\\-?]+)/(\\d\\.\\d)/?"
    val kind = regexp_extract(p, re, 1)
    val rawLic = regexp_extract(p, re, 2)
    val ver = regexp_extract(p, re, 3)
    val lic = when(kind === "publicdomain",
        when(rawLic === "zero", "cc0")
          .when(rawLic === "mark", "pdm")
          .otherwise(lit(null)))
      .when(kind === "licenses" && rawLic =!= "", rawLic)
      .otherwise(lit(null))
    (lic, when(lic.isNotNull, ver).otherwise(lit(null)))
  }

  /** Full resolver as a struct-returning column (UDF — the resolver's
    * ordered substring scan over 80 paths doesn't decompose into
    * built-ins cleanly; it is a tiny per-row cost). */
  val getLicenseInfoUdf = udf { (url: String, lic: String, ver: String) =>
    val (l, v, u) = getLicenseInfo(url, lic, ver)
    (l.orNull, v.orNull, u.orNull)
  }
}
