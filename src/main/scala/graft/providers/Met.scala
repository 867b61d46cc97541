package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Metropolitan Museum of Art extraction, set-oriented.
  *
  * The reference (provider_api_scripts/metropolitan_museum_of_art.py)
  * fetches one object JSON per id and emits one row per image: the
  * primary image (with its small rendition as thumbnail) plus each
  * additional image (:98-119), gated on isPublicDomain (:122-128),
  * with a foreign id of `objectID-<url basename sans extension>`
  * (:131-133) and a fixed six-key metadata dict (:136-146).
  */
object Met {

  val provider = "met"

  /** Parsed shape of one object JSON (fields the extraction
    * consumes). */
  val objectSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |objectID: BIGINT, isPublicDomain: BOOLEAN,
      |primaryImage: STRING, primaryImageSmall: STRING,
      |additionalImages: ARRAY<STRING>,
      |objectURL: STRING, title: STRING, artistDisplayName: STRING,
      |accessionNumber: STRING, classification: STRING, culture: STRING,
      |objectDate: STRING, medium: STRING, creditLine: STRING
      |>""".stripMargin.replace("\n", " "))

  /** One row per object JSON document. */
  def parseObjects(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(from_json(col(jsonCol), objectSchema).as("o"))

  /** `_build_foreign_id` (metropolitan_museum_of_art.py:131-133):
    * `{objectID}-{basename before the first dot}`. */
  def foreignId(objectId: Column, imageUrl: Column): Column =
    concat(objectId.cast("string"), lit("-"),
      element_at(split(element_at(split(imageUrl, "/"), -1), "\\."), 1))

  /** `_create_meta_data` (:136-146): fixed keys, null-preserving. */
  def metaData(o: Column): Column =
    map(
      lit("accession_number"), o.getField("accessionNumber"),
      lit("classification"), o.getField("classification"),
      lit("culture"), o.getField("culture"),
      lit("date"), o.getField("objectDate"),
      lit("medium"), o.getField("medium"),
      lit("credit_line"), o.getField("creditLine"))

  /** `_get_data_for_image` (:90-119): public-domain objects only; the
    * primary image carries the small rendition as its thumbnail,
    * additional images carry none. Input: parseObjects output. */
  def imageRows(objects: DataFrame): DataFrame = {
    val o = col("o")
    val imgs = concat(
      array(struct(o.getField("primaryImage").as("url"),
        o.getField("primaryImageSmall").as("thumb"))),
      transform(coalesce(o.getField("additionalImages"),
        array().cast("array<string>")),
        i => struct(i.as("url"), lit(null).cast("string").as("thumb"))))
    objects
      .filter(o.getField("isPublicDomain") === true)
      .select(o, explode(imgs).as("img"))
      .select(
        foreignId(o.getField("objectID"), col("img.url"))
          .as("foreign_identifier"),
        o.getField("objectURL").as("foreign_landing_url"),
        col("img.url").as("image_url"),
        col("img.thumb").as("thumbnail_url"),
        lit("cc0").as("license"),
        lit("1.0").as("license_version"),
        o.getField("artistDisplayName").as("creator"),
        o.getField("title").as("title"),
        metaData(o).as("meta_data"))
  }
}
