package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Walters Art Museum extraction, set-oriented.
  *
  * The reference (provider_api_scripts/walters_art_museum.py) pages
  * per-classification object lists (ReturnStatus=true gate, :140-153)
  * and emits one CC0 row per item: Raw/Small primary image renditions
  * (:165-187), a browse URL derived from the lowercased creator
  * (:190-196), and a seven-key null-dropping metadata dict
  * (:199-208).
  */
object Walters {

  val provider = "waltersartmuseum"
  val museumSite = "https://art.thewalters.org"
  val licenseUrl = "https://creativecommons.org/publicdomain/zero/1.0/"

  /** Parsed shape of one object item (fields the extraction
    * consumes). */
  val itemSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |ObjectNumber: STRING, ResourceURL: STRING, Title: STRING,
      |Creator: STRING, PublicAccessDate: STRING, Collection: STRING,
      |Medium: STRING, Classification: STRING, Description: STRING,
      |CreditLine: STRING,
      |PrimaryImage: STRUCT<Raw: STRING, Small: STRING>
      |>""".stripMargin.replace("\n", " "))

  val responseSchema: DataType = DataType.fromDDL(
    s"""STRUCT<ReturnStatus: BOOLEAN, NextPage: BOOLEAN,
       |Items: ARRAY<${itemSchema.sql}>>""".stripMargin.replace("\n", " "))

  /** `_extract_items_list_from_json` (walters_art_museum.py:140-153):
    * Items of ReturnStatus=true responses, one row per item. */
  def parseItems(raw: DataFrame, jsonCol: String): DataFrame = {
    val parsed = from_json(col(jsonCol), responseSchema)
    raw.select(parsed.as("resp"))
      .filter(col("resp.ReturnStatus") === true)
      .select(explode(col("resp.Items")).as("i"))
  }

  /** `_get_creator_info` (:190-196): browse URL from the lowercased
    * creator. Returns struct(creator, creator_url). */
  def creatorInfo(i: Column): Column = {
    val c = i.getField("Creator")
    struct(
      c.as("creator"),
      when(c.isNotNull && length(c) > 0,
        concat(lit(s"$museumSite/browse/"), lower(c))).as("creator_url"))
  }

  /** `_get_image_meta_data` (:199-208): seven verbatim keys, nulls
    * dropped. */
  def metaData(i: Column): Column =
    map_filter(
      map(
        lit("ObjectNumber"), i.getField("ObjectNumber"),
        lit("PublicAccessDate"), i.getField("PublicAccessDate"),
        lit("Collection"), i.getField("Collection"),
        lit("Medium"), i.getField("Medium"),
        lit("Classification"), i.getField("Classification"),
        lit("Description"), i.getField("Description"),
        lit("CreditLine"), i.getField("CreditLine")),
      (_, v) => v.isNotNull)

  /** `_process_image` (:165-187): one CC0 row per item. Input:
    * parseItems output. */
  def imageRows(items: DataFrame): DataFrame = {
    val i = col("i")
    val ci = creatorInfo(i)
    items.select(
      i.getField("ResourceURL").as("foreign_landing_url"),
      i.getField("PrimaryImage").getField("Raw").as("image_url"),
      i.getField("PrimaryImage").getField("Small").as("thumbnail_url"),
      lit(licenseUrl).as("license_url"),
      i.getField("ObjectNumber").as("foreign_identifier"),
      ci.getField("creator").as("creator"),
      ci.getField("creator_url").as("creator_url"),
      i.getField("Title").as("title"),
      metaData(i).as("meta_data"))
  }
}
