package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Rawpixel extraction, set-oriented.
  *
  * The reference (provider_api_scripts/raw_pixel.py) walks the
  * freecc0 search results one dict at a time: landing url gated on
  * the freecc0 flag (:53-67), dimensions parsed from the opengraph
  * image's w/h query params because the metadata dims drift from the
  * rescaled files (:70-83), `(Source)`-stripped owner (:86-90), a
  * description-only metadata dict (:93-96), and a keyword list minus
  * the cc0 boilerplate tags (:99-111). Everything is CC0 1.0.
  */
object Rawpixel {

  val provider = "rawpixel"

  val excludedTags: Seq[String] =
    Seq("cc0", "creative commons", "creative commons 0")

  /** Parsed shape of one search result (fields the extraction
    * consumes). */
  val resultSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |freecc0: BOOLEAN, id: BIGINT, url: STRING,
      |image_opengraph: STRING, image_400: STRING,
      |image_title: STRING, artist_names: STRING,
      |pinterest_description: STRING, keywords_raw: STRING
      |>""".stripMargin.replace("\n", " "))

  val responseSchema: DataType = DataType.fromDDL(
    s"STRUCT<total: BIGINT, results: ARRAY<${resultSchema.sql}>>"
      .replace("\n", " "))

  /** One row per search result. */
  def parseResults(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(explode(from_json(col(jsonCol), responseSchema)
      .getField("results")).as("r"))

  /** `_get_image_properties` (raw_pixel.py:70-83): opengraph url with
    * its w/h query params; image_400 thumbnail (missing -> '').
    * Returns struct(url, width, height, thumb). */
  def imageProperties(r: Column): Column = {
    val url = r.getField("image_opengraph")
    struct(
      url.as("url"),
      parse_url(url, lit("QUERY"), lit("w")).as("width"),
      parse_url(url, lit("QUERY"), lit("h")).as("height"),
      coalesce(r.getField("image_400"), lit("")).as("thumb"))
  }

  /** `_get_title_owner` (:86-90): owner drops the `(Source)`
    * suffix. */
  def titleOwner(r: Column): Column = struct(
    coalesce(r.getField("image_title"), lit("")).as("title"),
    trim(regexp_replace(coalesce(r.getField("artist_names"), lit("")),
      lit("\\(Source\\)"), lit(""))).as("owner"))

  /** `_get_tags` (:99-111): comma-split keywords, trimmed, minus the
    * cc0 boilerplate; empty/missing -> []. */
  def tags(keywordsRaw: Column,
      excluded: Seq[String] = excludedTags): Column =
    when(length(coalesce(keywordsRaw, lit(""))) > 0,
      filter(transform(split(keywordsRaw, ","), w => trim(w)),
        w => !w.isInCollection(excluded)))
      .otherwise(array().cast("array<string>"))

  /** `_process_image_data` (:114-145): freecc0-gated CC0 rows with
    * landing + image urls required; ids and dims stringified. */
  def imageRows(results: DataFrame): DataFrame = {
    val r = col("r")
    val props = imageProperties(r)
    val to = titleOwner(r)
    results
      .filter(r.getField("freecc0") === true &&
        r.getField("url").isNotNull && length(r.getField("url")) > 0)
      .withColumn("props", props)
      .filter(col("props.url").isNotNull && length(col("props.url")) > 0)
      .select(
        r.getField("id").cast("string").as("foreign_identifier"),
        r.getField("url").as("foreign_landing_url"),
        col("props.url").as("image_url"),
        lit("cc0").as("license"),
        lit("1.0").as("license_version"),
        col("props.width").as("width"),
        col("props.height").as("height"),
        when(length(to.getField("title")) > 0, to.getField("title"))
          .as("title"),
        map_filter(map(lit("description"),
          r.getField("pinterest_description")), (_, v) => v.isNotNull)
          .as("meta_data"),
        tags(r.getField("keywords_raw")).as("tags"),
        to.getField("owner").as("creator"),
        col("props.thumb").as("thumbnail_url"))
  }
}
