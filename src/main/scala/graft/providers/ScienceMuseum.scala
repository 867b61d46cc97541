package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Science Museum Group extraction, set-oriented.
  *
  * The reference (provider_api_scripts/science_museum.py) pages year
  * ranges of the collection API and processes one object dict at a
  * time, emitting one row per multimedia item: creator from the first
  * maker of the first creation event (:187-196), large > medium
  * rendition with relative-URL completion (:199-236), dimension-list
  * pluck (:239-248), usage-terms license split (:251-259,165-169), a
  * sparse metadata dict (:262-279), and a global RECORD_IDS dedupe
  * (:134-137).
  */
object ScienceMuseum {

  val provider = "sciencemuseum"
  val baseUrl = "https://coimages.sciencemuseumgroup.org.uk/images/"

  private val img =
    "STRUCT<location: STRING, measurements: STRUCT<dimensions: " +
      "ARRAY<STRUCT<dimension: STRING, value: INT>>>>"
  private val thumb = "STRUCT<location: STRING>"

  /** Parsed shape of one collection object (fields the extraction
    * consumes). */
  val objectSchema: DataType = DataType.fromDDL(
    s"""STRUCT<
       |id: STRING,
       |links: STRUCT<self: STRING>,
       |attributes: STRUCT<
       |  summary_title: STRING,
       |  lifecycle: STRUCT<creation: ARRAY<STRUCT<
       |    maker: ARRAY<STRUCT<summary_title: STRING>>>>>,
       |  identifier: ARRAY<STRUCT<value: STRING>>,
       |  name: ARRAY<STRUCT<value: STRING>>,
       |  categories: ARRAY<STRUCT<value: STRING>>,
       |  legal: STRUCT<credit_line: STRING>,
       |  description: ARRAY<STRUCT<value: STRING>>,
       |  multimedia: ARRAY<STRUCT<
       |    admin: STRUCT<uid: STRING>,
       |    processed: STRUCT<large: $img, medium: $img,
       |      large_thumbnail: $thumb, medium_thumbnail: $thumb,
       |      small_thumbnail: $thumb>,
       |    source: STRUCT<legal: STRUCT<rights: ARRAY<STRUCT<
       |      usage_terms: STRING>>>>>>
       |>>""".stripMargin.replace("\n", " "))

  val responseSchema: DataType = DataType.fromDDL(
    s"STRUCT<data: ARRAY<${objectSchema.sql}>>".replace("\n", " "))

  /** One row per object from raw search response pages. */
  def parseObjects(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(explode(from_json(col(jsonCol), responseSchema)
      .getField("data")).as("obj"))

  private def truthy(c: Column): Column =
    c.isNotNull && to_json(c) =!= "{}"

  /** `check_url` (science_museum.py:227-236): absolute URLs pass
    * through, relative locations get the image CDN base. */
  def checkUrl(u: Column): Column =
    when(u.isNotNull,
      when(u.contains("http"), u).otherwise(concat(lit(baseUrl), u)))

  /** `_get_creator_info` (:187-196): first maker of the first
    * creation event. */
  def creator(attr: Column): Column =
    element_at(element_at(attr.getField("lifecycle").getField("creation"), 1)
      .getField("maker"), 1).getField("summary_title")

  /** `_get_dimensions` (:239-248): dimension list -> height/width;
    * python's dict build means the LAST entry per dimension wins. */
  private def dim(measurements: Column, which: String): Column =
    element_at(filter(
      coalesce(measurements.getField("dimensions"),
        array().cast("array<struct<dimension:string,value:int>>")),
      d => d.getField("dimension") === which), -1).getField("value")

  /** `_get_image_info` (:199-211): large > medium rendition (python
    * dict truthiness), completed URL + dimensions;
    * struct(url, height, width). */
  def imageInfo(processed: Column): Column = {
    val pick = when(truthy(processed.getField("large")),
      processed.getField("large"))
      .when(truthy(processed.getField("medium")), processed.getField("medium"))
    val m = pick.getField("measurements")
    struct(
      checkUrl(pick.getField("location")).as("url"),
      dim(m, "height").as("height"),
      dim(m, "width").as("width"))
  }

  /** `_get_thumbnail_url` (:214-224): large > medium > small
    * thumbnail location, completed. */
  def thumbnailUrl(processed: Column): Column = {
    val pick = when(truthy(processed.getField("large_thumbnail")),
      processed.getField("large_thumbnail"))
      .when(truthy(processed.getField("medium_thumbnail")),
        processed.getField("medium_thumbnail"))
      .when(truthy(processed.getField("small_thumbnail")),
        processed.getField("small_thumbnail"))
    checkUrl(pick.getField("location"))
  }

  /** `_get_license_version` (:251-259): rights[0].usage_terms. */
  def licenseVersion(source: Column): Column =
    element_at(source.getField("legal").getField("rights"), 1)
      .getField("usage_terms")

  /** `_get_metadata` (:262-279): sparse keys, only present when the
    * source field parses. */
  def metaData(attr: Column): Column = {
    def first(f: String) =
      element_at(attr.getField(f), 1).getField("value")
    map_filter(
      map(
        lit("accession number"), first("identifier"),
        lit("name"), first("name"),
        lit("category"), first("categories"),
        lit("creditline"), attr.getField("legal").getField("credit_line"),
        lit("description"), first("description")),
      (_, v) => v.isNotNull)
  }

  /** `_handle_object_data` (:131-184): object-id dedupe, required
    * fields gated, one row per multimedia item with a parsed
    * `cc-xx yy` license. Input: parseObjects output. */
  def imageRows(objects: DataFrame): DataFrame = {
    val obj = col("obj")
    val attr = obj.getField("attributes")
    val lv = licenseVersion(col("m").getField("source"))
    val info = imageInfo(col("m").getField("processed"))
    objects
      .withColumn("_oid", obj.getField("id"))
      .dropDuplicates("_oid").drop("_oid")
      .filter(obj.getField("links").getField("self").isNotNull &&
        attr.isNotNull && attr.getField("multimedia").isNotNull)
      .select(obj, explode(attr.getField("multimedia")).as("m"))
      .filter(col("m").getField("admin").getField("uid").isNotNull)
      .withColumn("info", info)
      .filter(col("info.url").isNotNull)
      .withColumn("lv", lv)
      .filter(col("lv").isNotNull)
      .select(
        col("m").getField("admin").getField("uid").as("foreign_identifier"),
        obj.getField("links").getField("self").as("foreign_landing_url"),
        col("info.url").as("image_url"),
        col("info.height").as("height"),
        col("info.width").as("width"),
        regexp_replace(element_at(split(lower(col("lv")), " "), 1),
          "cc-", "").as("license"),
        element_at(split(lower(col("lv")), " "), 2).as("license_version"),
        thumbnailUrl(col("m").getField("processed")).as("thumbnail_url"),
        creator(attr).as("creator"),
        attr.getField("summary_title").as("title"),
        metaData(attr).as("meta_data"))
  }
}
