package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Brooklyn Museum extraction, set-oriented.
  *
  * The reference (provider_api_scripts/brooklyn_museum.py) walks
  * permissive-rights objects and emits one row per image: the license
  * URL is the single creativecommons.org link inside the rights-type
  * description HTML (:154-165), the image is the largest derivative
  * with scheme completion (:195-204), dimensions come from the
  * derivative whose size matches `largest_derivative` (:142-151),
  * creator is the rank-1 artist (:179-192), and a fixed six-key
  * null-preserving metadata dict (:168-176).
  */
object Brooklyn {

  val provider = "brooklynmuseum"

  /** Parsed shape of one object detail (fields the extraction
    * consumes). A non-list `derivatives` payload (the API sometimes
    * returns a map) fails the ARRAY parse and nulls out, mirroring
    * the reference's type check. */
  val objectSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |id: BIGINT, title: STRING, accession_number: STRING,
      |object_date: STRING, description: STRING, medium: STRING,
      |credit_line: STRING, classification: STRING,
      |rights_type: STRUCT<name: STRING, public_name: STRING,
      |  description: STRING>,
      |artists: ARRAY<STRUCT<name: STRING, rank: INT>>,
      |images: ARRAY<STRUCT<
      |  id: BIGINT, largest_derivative_url: STRING,
      |  thumbnail_url: STRING, largest_derivative: STRING,
      |  derivatives: ARRAY<STRUCT<size: STRING, width: INT,
      |    height: INT>>>>
      |>""".stripMargin.replace("\n", " "))

  /** One row per object detail document. */
  def parseObjects(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(from_json(col(jsonCol), objectSchema).as("o"))

  /** `_get_license_url` (brooklyn_museum.py:154-165): all link targets
    * in the description HTML; exactly ONE creativecommons.org link
    * qualifies, anything else -> null. */
  def licenseUrl(rightsType: Column): Column = {
    val links = regexp_extract_all(
      coalesce(rightsType.getField("description"), lit("")),
      lit("""(?:href|src)="([^"]+)""""), lit(1))
    val cc = filter(links, l => l.contains("https://creativecommons.org/"))
    when(size(cc) === 1, element_at(cc, 1))
  }

  /** `_get_images` (:195-204): largest derivative URL, https-completed;
    * thumbnail likewise ('' stays ''). Returns struct(url, thumb). */
  def images(image: Column): Column = {
    def complete(u: Column): Column =
      when(u.contains("http"), u).otherwise(concat(lit("https://"), u))
    val url = image.getField("largest_derivative_url")
    val thumbRaw = coalesce(image.getField("thumbnail_url"), lit(""))
    struct(
      when(url.isNotNull && length(url) > 0, complete(url)).as("url"),
      when(length(thumbRaw) > 0, complete(thumbRaw)).otherwise(lit(""))
        .as("thumb"))
  }

  /** `_get_image_sizes` (:142-151): the derivative whose size matches
    * largest_derivative (last match wins); struct(height, width). */
  def imageSizes(image: Column): Column = {
    val target = coalesce(image.getField("largest_derivative"), lit(""))
    val hit = element_at(filter(
      coalesce(image.getField("derivatives"), array().cast(
        "array<struct<size:string,width:int,height:int>>")),
      d => coalesce(d.getField("size"), lit("")) === target), -1)
    struct(hit.getField("height").as("height"),
      hit.getField("width").as("width"))
  }

  /** `_get_metadata` (:168-176): fixed keys, null-preserving. */
  def metaData(o: Column): Column =
    map(
      lit("accession_number"), o.getField("accession_number"),
      lit("date"), o.getField("object_date"),
      lit("description"), o.getField("description"),
      lit("medium"), o.getField("medium"),
      lit("credit_line"), o.getField("credit_line"),
      lit("classification"), o.getField("classification"))

  /** `_get_creators` (:179-192): first rank-1 artist name. */
  def creators(o: Column): Column =
    element_at(filter(coalesce(o.getField("artists"),
      array().cast("array<struct<name:string,rank:int>>")),
      a => a.getField("rank") === 1), 1).getField("name")

  /** `_handle_object_data` + the batch license gate (:92-139): only
    * objects with a resolvable CC license and an images list; one row
    * per image with a non-null completed URL. */
  def imageRows(objects: DataFrame): DataFrame = {
    val o = col("o")
    val lic = licenseUrl(o.getField("rights_type"))
    val img = images(col("img"))
    val sizes = imageSizes(col("img"))
    objects
      .withColumn("license_url", lic)
      .filter(col("license_url").isNotNull &&
        o.getField("images").isNotNull)
      .select(o, col("license_url"), explode(o.getField("images")).as("img"))
      .withColumn("pick", img)
      .filter(col("pick.url").isNotNull)
      .select(
        col("img").getField("id").as("foreign_identifier"),
        concat(lit("https://www.brooklynmuseum.org/opencollection/objects/"),
          o.getField("id").cast("string")).as("foreign_landing_url"),
        col("pick.url").as("image_url"),
        col("pick.thumb").as("thumbnail_url"),
        col("license_url"),
        sizes.getField("width").as("width"),
        sizes.getField("height").as("height"),
        o.getField("title").as("title"),
        creators(o).as("creator"),
        metaData(o).as("meta_data"))
  }
}
