package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Museums Victoria extraction, set-oriented.
  *
  * The reference (provider_api_scripts/museum_victoria.py) walks
  * per-license search pages and emits one row per image media entry:
  * large > medium > small rendition by KEY PRESENCE (:165-183), a
  * creativecommons-substring licence uri gate (:186-193), media-level
  * comma-joined creators (:214-218), object metadata with
  * unconditional scalar keys and comma-joined lists (:196-211), and a
  * global RECORDS_IDS object dedupe (:104-107).
  */
object MuseumVictoria {

  val provider = "museumvictoria"
  val landingPage = "https://collections.museumsvictoria.com.au/"

  private val rend = "STRUCT<uri: STRING, height: INT, width: INT>"

  /** Parsed shape of one search object (fields the extraction
    * consumes). */
  val objectSchema: DataType = DataType.fromDDL(
    s"""STRUCT<
       |id: STRING, displayTitle: STRING, dateModified: STRING,
       |category: STRING, physicalDescription: STRING,
       |keywords: ARRAY<STRING>, classifications: ARRAY<STRING>,
       |media: ARRAY<STRUCT<
       |  type: STRING, id: STRING,
       |  large: $rend, medium: $rend, small: $rend,
       |  thumbnail: STRUCT<uri: STRING>,
       |  licence: STRUCT<uri: STRING>,
       |  creators: ARRAY<STRING>>>
       |>""".stripMargin.replace("\n", " "))

  val responseSchema: DataType = DataType.fromDDL(
    s"ARRAY<${objectSchema.sql}>".replace("\n", " "))

  /** One row per object from a raw batch (the API returns a bare
    * JSON array). */
  def parseObjects(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(explode(from_json(col(jsonCol), responseSchema)).as("obj"))

  /** `_get_image_data` (museum_victoria.py:165-183): large > medium >
    * small by key presence; struct(url, height, width). */
  def imageData(media: Column): Column = {
    def r(k: String) = {
      val x = media.getField(k)
      struct(x.getField("uri").as("url"), x.getField("height").as("height"),
        x.getField("width").as("width"))
    }
    when(media.getField("large").isNotNull, r("large"))
      .when(media.getField("medium").isNotNull, r("medium"))
      .when(media.getField("small").isNotNull, r("small"))
  }

  /** `_get_license_url` (:186-193): licence.uri when it names
    * creativecommons. */
  def licenseUrl(media: Column): Column = {
    val uri = media.getField("licence").getField("uri")
    when(uri.contains("creativecommons"), uri)
  }

  /** `_get_creator` (:214-218): media creators comma-joined. */
  def creator(media: Column): Column =
    when(media.getField("creators").isNotNull,
      array_join(media.getField("creators"), ","))

  /** `_get_metadata` (:196-211): unconditional scalar keys (nulls
    * kept), lists joined only when present. */
  def metaData(obj: Column): Column =
    map_filter(
      map(
        lit("datemodified"), obj.getField("dateModified"),
        lit("category"), obj.getField("category"),
        lit("description"), obj.getField("physicalDescription"),
        lit("keywords"),
        when(obj.getField("keywords").isNotNull,
          array_join(obj.getField("keywords"), ",")),
        lit("classifications"),
        when(obj.getField("classifications").isNotNull,
          array_join(obj.getField("classifications"), ","))),
      (k, v) => v.isNotNull ||
        k.isInCollection(Seq("datemodified", "category", "description")))

  /** `_handle_batch_objects` + `_get_media_info` (:98-162): object-id
    * dedupe, one row per image media entry with url+id+license
    * required. Input: parseObjects output. */
  def imageRows(objects: DataFrame): DataFrame = {
    val obj = col("obj")
    val m = col("m")
    val img = imageData(m)
    objects
      .withColumn("_oid", obj.getField("id"))
      .dropDuplicates("_oid").drop("_oid")
      .filter(obj.getField("media").isNotNull)
      .select(obj, explode(obj.getField("media")).as("m"))
      .filter(m.getField("type") === "image")
      .withColumn("img", img)
      .withColumn("license_url", licenseUrl(m))
      .filter(col("img.url").isNotNull && m.getField("id").isNotNull &&
        col("license_url").isNotNull)
      .select(
        m.getField("id").as("foreign_identifier"),
        concat(lit(landingPage), obj.getField("id"))
          .as("foreign_landing_url"),
        col("img.url").as("image_url"),
        col("img.height").as("height"),
        col("img.width").as("width"),
        col("license_url"),
        m.getField("thumbnail").getField("uri").as("thumbnail_url"),
        obj.getField("displayTitle").as("title"),
        creator(m).as("creator"),
        metaData(obj).as("meta_data"))
  }
}
