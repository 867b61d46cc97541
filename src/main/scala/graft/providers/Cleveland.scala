package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Cleveland Museum of Art Open Access extraction, set-oriented.
  *
  * The reference (provider_api_scripts/cleveland_museum_of_art.py)
  * pages the artworks API and processes one dict at a time: CC0
  * license gate (:96-100), web > print > full image-rendition pick
  * with the python truthiness of possibly-empty dicts (:138-156), and
  * a fixed 7-key metadata dict with ''-defaults and a comma-joined
  * culture list (:159-171).
  */
object Cleveland {

  val provider = "clevelandmuseum"

  private val img =
    "STRUCT<url: STRING, filename: STRING, filesize: STRING, " +
      "width: STRING, height: STRING>"

  /** Parsed shape of one artwork dict (fields the extraction
    * consumes; renditions carry STRING dims in this API). */
  val itemSchema: DataType = DataType.fromDDL(
    s"""STRUCT<
       |id: BIGINT, accession_number: STRING,
       |share_license_status: STRING, url: STRING, title: STRING,
       |creation_date: STRING, technique: STRING, type: STRING,
       |tombstone: STRING, creditline: STRING,
       |culture: ARRAY<STRING>,
       |creators: ARRAY<STRUCT<description: STRING>>,
       |images: STRUCT<web: $img, print: $img, full: $img>
       |>""".stripMargin.replace("\n", " "))

  val responseSchema: DataType = DataType.fromDDL(
    s"STRUCT<info: STRUCT<total: BIGINT>, data: ARRAY<${itemSchema.sql}>>"
      .replace("\n", " "))

  /** One row per artwork dict from raw API response pages. */
  def parseItems(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(explode(from_json(col(jsonCol), responseSchema)
      .getField("data")).as("d"))

  /** Python dict truthiness for a struct parsed from JSON: `{}` and
    * missing are falsy; any populated field is truthy (to_json drops
    * null fields). */
  private def truthy(c: Column): Column =
    c.isNotNull && to_json(c) =!= "{}"

  /** `_get_image_type` (cleveland_museum_of_art.py:138-156): first
    * TRUTHY rendition dict among web/print/full wins — even when it
    * lacks a url (no fall-through); a winning rendition without a url
    * yields null. Returns struct(url, width, height, key). */
  def imagePick(images: Column): Column = {
    def ren(k: String) = {
      val r = images.getField(k)
      struct(r.getField("url").as("url"), r.getField("width").as("width"),
        r.getField("height").as("height"), lit(k).as("key"))
    }
    val picked = when(truthy(images.getField("web")), ren("web"))
      .when(truthy(images.getField("print")), ren("print"))
      .when(truthy(images.getField("full")), ren("full"))
    // a truthy dict with no url reports no dimensions either (:110-114)
    when(picked.getField("url").isNotNull, picked)
  }

  /** `_get_metadata` (:159-171): all seven keys always present,
    * ''-defaulted; culture is the comma-join of its non-null items. */
  def metaData(d: Column): Column = {
    def s(f: String) = coalesce(d.getField(f), lit(""))
    map(
      lit("accession_number"), s("accession_number"),
      lit("technique"), s("technique"),
      lit("date"), s("creation_date"),
      lit("credit_line"), s("creditline"),
      lit("classification"), s("type"),
      lit("tombstone"), s("tombstone"),
      lit("culture"), array_join(
        filter(coalesce(d.getField("culture"),
          array().cast("array<string>")), _.isNotNull), ","))
  }

  /** `creators[0].description` else '' (:118-121). */
  def creator(d: Column): Column = {
    val cs = d.getField("creators")
    when(size(cs) > 0,
      coalesce(element_at(cs, 1).getField("description"), lit("")))
      .otherwise(lit(""))
  }

  /** `_handle_response` (:92-135): CC0-only rows, one output row per
    * artwork. Input: parseItems output. */
  def imageRows(items: DataFrame): DataFrame = {
    val d = col("d")
    val pick = imagePick(d.getField("images"))
    items
      .filter(lower(coalesce(d.getField("share_license_status"),
        lit(""))) === "cc0")
      .select(
        d.getField("id").as("foreign_identifier"),
        d.getField("url").as("foreign_landing_url"),
        pick.getField("url").as("image_url"),
        lit("cc0").as("license"),
        lit("1.0").as("license_version"),
        pick.getField("width").as("width"),
        pick.getField("height").as("height"),
        d.getField("title").as("title"),
        creator(d).as("creator"),
        metaData(d).as("meta_data"))
  }
}
