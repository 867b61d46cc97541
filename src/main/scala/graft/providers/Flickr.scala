package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Flickr API extraction, re-expressed set-oriented.
  *
  * The reference (provider_api_scripts/flickr.py) walks half-hour
  * upload windows and processes one photo dict at a time:
  * size-preference image URL pick (:316-330), license-id lookup
  * (:50-59,333-341), creator/landing URL construction (:287-313),
  * HTML-stripped description into meta_data (:344-364), and a
  * sorted-set tag list off a length-capped tag string (:367-381).
  *
  * Here a whole day of API responses is one DataFrame: every per-dict
  * pluck becomes a codegen'd Column over a declared JSON schema, so
  * the same program handles one page or a billion photos without a
  * driver loop.
  */
object Flickr {

  /** LICENSE_INFO (flickr.py:50-59): Flickr numeric license id ->
    * (license, version). */
  val licenseInfo: Map[String, (String, String)] = Map(
    "1" -> ("by-nc-sa", "2.0"),
    "2" -> ("by-nc", "2.0"),
    "3" -> ("by-nc-nd", "2.0"),
    "4" -> ("by", "2.0"),
    "5" -> ("by-sa", "2.0"),
    "6" -> ("by-nd", "2.0"),
    "9" -> ("cc0", "1.0"),
    "10" -> ("pdm", "1.0"))

  /** FLICKR_PHOTO_URL_BASE (provider_details.py:56). */
  val photoUrlBase = "https://www.flickr.com/photos/"

  val maxTagStringLength = 2000
  val maxDescriptionLength = 2000

  /** Parsed shape of one photo dict (fields the extraction consumes;
    * dims are INT in the API payload, o_dims STRING). */
  val photoSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |id: STRING, owner: STRING, license: STRING, title: STRING,
      |description: STRUCT<_content: STRING>,
      |dateupload: STRING, datetaken: STRING, ownername: STRING,
      |views: STRING, tags: STRING,
      |url_t: STRING, height_t: INT, width_t: INT,
      |url_s: STRING, height_s: INT, width_s: INT,
      |url_m: STRING, height_m: INT, width_m: INT,
      |url_l: STRING, height_l: INT, width_l: INT
      |>""".stripMargin.replace("\n", " "))

  val responseSchema: DataType = DataType.fromDDL(
    ("STRUCT<stat: STRING, photos: STRUCT<page: INT, pages: INT, " +
      s"perpage: INT, total: STRING, photo: ARRAY<${photoSchema.sql}>>>")
      .replace("\n", " "))

  /** `_extract_image_list_from_json` (flickr.py:229-243): photos.photo
    * of responses whose stat is 'ok', one row per photo. */
  def parsePhotos(raw: DataFrame, jsonCol: String): DataFrame = {
    val parsed = from_json(col(jsonCol), responseSchema)
    raw.select(parsed.as("resp"))
      .filter(col("resp.stat") === "ok")
      .select(explode(col("resp.photos.photo")).as("p"))
  }

  /** `_url_join` (flickr.py:310-313): strip '/' off every segment,
    * join with '/'. */
  def urlJoin(segments: Column*): Column =
    concat_ws("/", segments.map(s =>
      regexp_replace(s, "^/+|/+$", "")): _*)

  /** `_build_creator_url` (flickr.py:287-296): base + stripped owner;
    * null owner -> null. */
  def creatorUrl(owner: Column): Column =
    when(owner.isNotNull, urlJoin(lit(photoUrlBase), trim(owner)))

  /** `_build_foreign_landing_url` (flickr.py:299-307): creator_url +
    * id; falsy (null/empty) either side -> null. */
  def foreignLandingUrl(creatorUrl: Column, foreignId: Column): Column =
    when(length(coalesce(creatorUrl, lit(""))) > 0 &&
      length(coalesce(foreignId, lit(""))) > 0,
      urlJoin(creatorUrl, foreignId))

  /** `_get_image_url` (flickr.py:316-330): prefer large, then medium,
    * then small; returns struct(url, height, width). */
  def imagePick(p: Column): Column = {
    def sz(s: String) = struct(
      p.getField(s"url_$s").as("url"),
      p.getField(s"height_$s").as("height"),
      p.getField(s"width_$s").as("width"))
    when(p.getField("url_l").isNotNull, sz("l"))
      .when(p.getField("url_m").isNotNull, sz("m"))
      .when(p.getField("url_s").isNotNull, sz("s"))
  }

  /** `_get_license` (flickr.py:333-341): id (any type, str()-cast) ->
    * struct(license, license_version); unknown -> null. */
  def license(licenseId: Column,
      info: Map[String, (String, String)] = licenseInfo): Column = {
    val m = map(info.toSeq.flatMap { case (k, (l, v)) =>
      Seq(lit(k), struct(lit(l).as("license"), lit(v).as("version")))
    }: _*)
    element_at(m, licenseId.cast("string"))
  }

  /** lxml `' '.join(fromstring(desc).xpath('//text()')).strip()`
    * (flickr.py:353-360): every tag becomes one text-node boundary
    * (single space), outer whitespace trimmed. */
  def stripHtml(raw: Column): Column =
    trim(regexp_replace(raw, "<[^>]+>", " "))

  /** `_create_meta_data_dict` (flickr.py:344-364): pub_date /
    * date_taken / views carried verbatim, description HTML-stripped
    * and capped, nulls dropped. */
  def metaData(p: Column,
      maxDescription: Int = maxDescriptionLength): Column = {
    val content = p.getField("description").getField("_content")
    val desc = when(length(trim(content)) > 0,
      substring(stripHtml(content), 1, maxDescription))
    map_filter(
      map(
        lit("pub_date"), p.getField("dateupload"),
        lit("date_taken"), p.getField("datetaken"),
        lit("views"), p.getField("views"),
        lit("description"), desc),
      (_, v) => v.isNotNull)
  }

  /** `_create_tags_list` (flickr.py:367-381): strip, cap the STRING
    * length (not the tag count), whitespace-split, distinct, sorted;
    * empty -> null. */
  def tagsList(tags: Column, maxLen: Int = maxTagStringLength): Column = {
    val capped = substring(trim(tags), 1, maxLen)
    when(length(capped) > 0,
      array_sort(array_distinct(
        filter(split(capped, "\\s+"), t => length(t) > 0))))
  }

  /** Owner NSID -> sub-provider source, default 'flickr'
    * (flickr.py:265-267). */
  def source(owner: Column): Column = {
    val inv = ProviderDetails.invert(ProviderDetails.flickrSubProviders)
    val m = map(inv.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    coalesce(element_at(m, trim(owner)),
      lit(ProviderDetails.FlickrDefaultProvider))
  }

  /** Full extraction (`_process_image_data`, flickr.py:254-284): one
    * output row per photo dict. Input: parsePhotos output. */
  def imageRows(photos: DataFrame): DataFrame = {
    val p = col("p")
    val cu = creatorUrl(p.getField("owner"))
    val lic = license(p.getField("license"))
    val pick = imagePick(p)
    photos.select(
      p.getField("id").as("foreign_identifier"),
      foreignLandingUrl(cu, p.getField("id")).as("foreign_landing_url"),
      pick.getField("url").as("image_url"),
      p.getField("url_s").as("thumbnail_url"),
      lic.getField("license").as("license"),
      lic.getField("version").as("license_version"),
      pick.getField("width").as("width"),
      pick.getField("height").as("height"),
      p.getField("ownername").as("creator"),
      cu.as("creator_url"),
      p.getField("title").as("title"),
      metaData(p).as("meta_data"),
      tagsList(p.getField("tags")).as("tags"),
      source(p.getField("owner")).as("source"))
  }
}
