package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.clean.Cleaning

/** The 17-column image interchange relation and its preparation
  * pipeline — the reference's buffered `ImageStore`
  * (common/storage/image.py) re-expressed set-oriented: one projection
  * cleans, enriches, and filters every row; the TSV boundary is
  * graft.io.Tsv. Row buffering disappears under Spark's vectorized
  * writers (SURVEY §2.1 S7).
  */
object ImageStore {

  /** _IMAGE_TSV_COLUMNS (image.py:12-67): order is load-bearing for
    * the TSV boundary. */
  val schema: StructType = StructType.fromDDL(
    """foreign_identifier STRING, foreign_landing_url STRING,
      |image_url STRING, thumbnail_url STRING,
      |width INT, height INT, filesize INT,
      |license_ STRING, license_version STRING,
      |creator STRING, creator_url STRING, title STRING,
      |meta_data MAP<STRING,STRING>, tags ARRAY<STRUCT<name: STRING, provider: STRING>>,
      |watermarked STRING, provider STRING, source STRING""".stripMargin
      .replace("\n", " "))

  /** image.py:76-81 TAG_BLACKLIST — exact-match bans. */
  val tagBlacklist: Set[String] = Set("no person", "squareformat")

  /** image.py:84-96 TAG_CONTAINS_BLACKLIST — substring bans. */
  val tagContainsBlacklist: Seq[String] = Seq(
    "flickriosapp", "uploaded", ":", "=", "cc0", "by", "by-nc", "by-nd",
    "by-sa", "by-nc-nd", "by-nc-sa", "pdm")

  /** P8 (image.py:356-369): a raw tag is dropped when exact-banned or
    * containing a banned substring. Pure Column predicate. */
  def tagBlacklisted(tag: Column): Column = {
    val exact = tag.isin(tagBlacklist.toSeq: _*)
    val contains = tagContainsBlacklist
      .map(b => tag.contains(b))
      .reduce(_ || _)
    exact || contains
  }

  /** §2.9 tag enrichment (image.py:386-402): raw tag strings become
    * {name, provider} structs after blacklist filtering; null tag
    * arrays stay null. */
  def enrichTags(rawTags: Column, provider: String): Column =
    when(rawTags.isNull, lit(null))
      .otherwise(transform(
        filter(rawTags, t => !tagBlacklisted(t)),
        t => struct(t.as("name"), lit(provider).as("provider"))))

  /** §2.9 meta_data enrichment (image.py:371-384): inject license_url
    * and raw_license_url keys (argument wins over existing map; null
    * map becomes a fresh two-key map). */
  def enrichMetaData(meta: Column, licenseUrl: Column, rawLicenseUrl: Column): Column = {
    val injected = map(lit("license_url"), licenseUrl,
      lit("raw_license_url"), rawLicenseUrl)
    when(meta.isNull, injected)
      .otherwise(map_zip_with(meta, injected, (_, o, n) => coalesce(n, o)))
  }

  /** The TSV SINK relation: [[prepare]]'s typed output as the exact
    * 17-column string relation the reference's loader COPYs
    * (image.py:12-67 — the column ORDER is load-bearing; meta_data
    * and tags sit at positions 13-14, NOT appended last). jsonb
    * columns cross as JSON strings with every leaf sanitized
    * recursively (columns.py:131-173); booleans are already the
    * `t`/`f` strings of columns.py:89-118 (Cleaning.boolCast); ints
    * render as plain digits; nulls become `\N` in graft.io.Tsv. */
  def toTsv(prepared: DataFrame): DataFrame =
    prepared.select(
      col("foreign_identifier"), col("foreign_landing_url"),
      col("image_url"), col("thumbnail_url"),
      col("width"), col("height"), col("filesize"),
      col("license_"), col("license_version"),
      col("creator"), col("creator_url"), col("title"),
      Cleaning.sanitizeJsonString(to_json(col("meta_data"))).as("meta_data"),
      Cleaning.sanitizeJsonString(to_json(col("tags"))).as("tags"),
      col("watermarked"), col("provider"), col("source"))

  /** The per-row preparation pipeline (image.py:240-320 add_item):
    * string/URL/int/bool column prep via the Cleaning kernel with the
    * reference's per-column sizes, then the required-field row drop
    * (P7: foreign_landing_url, image_url, license_, license_version).
    *
    * P9: when `imageMediatypes` is set and the input carries a
    * `mediatype` column, rows of any other mediatype are dropped
    * before preparation (wikimedia_commons.py:58,259-269's
    * IMAGE_MEDIATYPES gate). The column is consumed by the filter and
    * does not reach the 17-column relation.
    */
  def prepare(df: DataFrame, provider: String,
      imageMediatypes: Option[Seq[String]] = None): DataFrame = {
    val gated = imageMediatypes match {
      case Some(types) if df.columns.contains("mediatype") =>
        df.filter(col("mediatype").isin(types: _*))
      case _ => df
    }
    gated.select(
      Cleaning.enforceCharLimit(Cleaning.sanitizeString(col("foreign_identifier")),
        3000, truncate = false).as("foreign_identifier"),
      Cleaning.prepareUrl(col("foreign_landing_url"), 1000).as("foreign_landing_url"),
      Cleaning.prepareUrl(col("image_url"), 3000).as("image_url"),
      Cleaning.prepareUrl(col("thumbnail_url"), 3000).as("thumbnail_url"),
      Cleaning.intCast(col("width")).as("width"),
      Cleaning.intCast(col("height")).as("height"),
      Cleaning.intCast(col("filesize")).as("filesize"),
      Cleaning.enforceCharLimit(Cleaning.sanitizeString(col("license_")),
        50, truncate = false).as("license_"),
      Cleaning.enforceCharLimit(Cleaning.sanitizeString(col("license_version")),
        25, truncate = false).as("license_version"),
      Cleaning.prepareString(col("creator"), 2000).as("creator"),
      Cleaning.prepareUrl(col("creator_url"), 2000).as("creator_url"),
      Cleaning.prepareString(col("title"), 5000).as("title"),
      enrichMetaData(col("meta_data"), col("license_url"), col("raw_license_url"))
        .as("meta_data"),
      enrichTags(col("tags"), provider).as("tags"),
      Cleaning.boolCast(col("watermarked")).as("watermarked"),
      lit(provider).as("provider"),
      coalesce(col("source"), lit(provider)).as("source"))
      .na.drop(Seq("foreign_landing_url", "image_url", "license_",
        "license_version"))
  }
}
