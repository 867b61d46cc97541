package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Statens Museum for Kunst (SMK) extraction, set-oriented.
  *
  * The reference (provider_api_scripts/staten_museum.py) walks
  * public-domain search items and emits one row per IIIF image: the
  * main image_iiif_id plus each alternative image (:133-173), with
  * /full/max/0/default.jpg and /full/!400,/0/default.jpg renditions
  * (:176-186), a creativecommons-substring cc0 license gate
  * (:189-195), production[0]/titles[0] creator+title (:198-211), and
  * a metadata dict with an unconditional created_date plus
  * comma-joined list fields (:214-226).
  */
object Staten {

  val provider = "statensmuseum"
  val landingPageBase = "https://open.smk.dk/en/artwork/image/"
  val imageSize = "max"
  val thumbnailSize = 400

  /** Parsed shape of one search item (fields the extraction
    * consumes). */
  val itemSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |object_number: STRING, rights: STRING, created: STRING,
      |image_iiif_id: STRING, image_height: INT, image_width: INT,
      |alternative_images: ARRAY<STRUCT<iiif_id: STRING, height: INT,
      |  width: INT>>,
      |production: ARRAY<STRUCT<creator: STRING>>,
      |titles: ARRAY<STRUCT<title: STRING>>,
      |collection: ARRAY<STRING>, techniques: ARRAY<STRING>,
      |colors: ARRAY<STRING>
      |>""".stripMargin.replace("\n", " "))

  val responseSchema: DataType = DataType.fromDDL(
    s"STRUCT<items: ARRAY<${itemSchema.sql}>>".replace("\n", " "))

  /** One row per item from raw search response pages. */
  def parseItems(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(explode(from_json(col(jsonCol), responseSchema)
      .getField("items")).as("item"))

  /** `_get_image_url` (staten_museum.py:176-186). */
  def imageUrl(iiifId: Column): Column =
    concat(iiifId, lit(s"/full/$imageSize/0/default.jpg"))

  def thumbnailUrl(iiifId: Column): Column =
    concat(iiifId, lit(s"/full/!$thumbnailSize,/0/default.jpg"))

  /** `_get_images` (:133-173): main image + alternatives as one
    * array of struct(iiif_id, image_url, thumbnail, height, width). */
  def images(item: Column): Column = {
    def entry(id: Column, h: Column, w: Column) = struct(
      id.as("iiif_id"), imageUrl(id).as("image_url"),
      thumbnailUrl(id).as("thumbnail"), h.as("height"), w.as("width"))
    val main = when(item.getField("image_iiif_id").isNotNull,
      array(entry(item.getField("image_iiif_id"),
        item.getField("image_height"), item.getField("image_width"))))
      .otherwise(array().cast(
        "array<struct<iiif_id:string,image_url:string,thumbnail:string," +
          "height:int,width:int>>"))
    val alts = transform(
      filter(coalesce(item.getField("alternative_images"), array().cast(
        "array<struct<iiif_id:string,height:int,width:int>>")),
        a => a.getField("iiif_id").isNotNull),
      a => entry(a.getField("iiif_id"), a.getField("height"),
        a.getField("width")))
    concat(main, alts)
  }

  /** `_get_license_info` (:189-195): any creativecommons rights
    * string is cc0 1.0. */
  def isCcRights(rights: Column): Column =
    rights.isNotNull && rights.contains("creativecommons")

  /** `_get_metadata` (:214-226): created_date always present (even
    * null); list fields comma-joined only when they parse. */
  def metaData(item: Column): Column =
    map_filter(
      map(
        lit("created_date"), item.getField("created"),
        lit("collection"),
        when(item.getField("collection").isNotNull,
          array_join(item.getField("collection"), ",")),
        lit("techniques"),
        when(item.getField("techniques").isNotNull,
          array_join(item.getField("techniques"), ",")),
        lit("colors"),
        when(item.getField("colors").isNotNull,
          array_join(item.getField("colors"), ","))),
      (k, v) => v.isNotNull || k === "created_date")

  /** `_handle_items_data` (:94-130): cc-licensed items with an
    * object_number, one row per image. Input: parseItems output. */
  def imageRows(items: DataFrame): DataFrame = {
    val item = col("item")
    items
      .filter(isCcRights(item.getField("rights")) &&
        item.getField("object_number").isNotNull)
      .select(item, explode(images(item)).as("img"))
      .select(
        col("img").getField("iiif_id").as("foreign_identifier"),
        concat(lit(landingPageBase), item.getField("object_number"))
          .as("foreign_landing_url"),
        col("img").getField("image_url").as("image_url"),
        col("img").getField("height").as("height"),
        col("img").getField("width").as("width"),
        lit("cc0").as("license"),
        lit("1.0").as("license_version"),
        col("img").getField("thumbnail").as("thumbnail_url"),
        element_at(item.getField("production"), 1).getField("creator")
          .as("creator"),
        element_at(item.getField("titles"), 1).getField("title").as("title"),
        metaData(item).as("meta_data"))
  }
}
