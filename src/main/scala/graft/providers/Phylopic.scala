package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** PhyloPic extraction, set-oriented.
  *
  * The reference (provider_api_scripts/phylopic.py) fetches one
  * detail JSON per image uid and plucks: the widest png >= 257px as
  * the image (foreign id IS the image url), the exactly-256px png as
  * the thumbnail else '' (:230-261), creator/credit/pub_date from
  * submitter+credit (:197-210), and a taxa list whose first entry is
  * the title (:213-227). Dims are stringified in the output row
  * (:191-194).
  */
object Phylopic {

  val provider = "phylopic"
  val baseUrl = "http://phylopic.org"

  /** Parsed shape of one detail response. */
  val responseSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |success: BOOLEAN,
      |result: STRUCT<
      |  uid: STRING,
      |  taxa: ARRAY<STRUCT<canonicalName: STRUCT<uid: STRING,
      |    string: STRING>>>,
      |  submitted: STRING, credit: STRING,
      |  pngFiles: ARRAY<STRUCT<url: STRING, width: INT, height: INT>>,
      |  licenseURL: STRING,
      |  submitter: STRUCT<firstName: STRING, lastName: STRING>>
      |>""".stripMargin.replace("\n", " "))

  /** One row per successful detail response. */
  def parseDetails(raw: DataFrame, jsonCol: String): DataFrame = {
    val parsed = from_json(col(jsonCol), responseSchema)
    raw.select(parsed.as("resp"))
      .filter(col("resp.success") === true)
      .select(col("resp.result").as("r"))
  }

  /** `_get_image_info` (phylopic.py:230-261): among pngFiles with
    * width >= 257, the widest wins; the width-256 file is the
    * thumbnail, else ''. Returns struct(url, width, height, thumb). */
  def imageInfo(r: Column): Column = {
    val png = coalesce(r.getField("pngFiles"),
      array().cast("array<struct<url:string,width:int,height:int>>"))
    val ranked = sort_array(transform(
      filter(png, x => x.getField("width") >= 257),
      x => struct(x.getField("width").as("width"),
        x.getField("height").as("height"), x.getField("url").as("url"))),
      asc = false)
    val best = element_at(ranked, 1)
    val thb = element_at(
      filter(png, x => x.getField("width") === 256), 1)
    struct(
      when(best.isNotNull, concat(lit(baseUrl), best.getField("url")))
        .as("url"),
      best.getField("width").as("width"),
      best.getField("height").as("height"),
      coalesce(concat(lit(baseUrl), thb.getField("url")), lit(""))
        .as("thumb"))
  }

  /** `_get_creator_details` (:197-210): submitter name join; credit
    * gates credit_line AND pub_date. Returns struct(creator,
    * credit_line, pub_date). */
  def creatorDetails(r: Column): Column = {
    val sub = r.getField("submitter")
    val credit = r.getField("credit")
    struct(
      trim(concat_ws(" ", sub.getField("firstName"),
        sub.getField("lastName"))).as("creator"),
      when(length(coalesce(credit, lit(""))) > 0, trim(credit))
        .as("credit_line"),
      when(length(coalesce(credit, lit(""))) > 0,
        trim(r.getField("submitted"))).as("pub_date"))
  }

  /** `_get_taxa_details` (:213-227): canonical-name strings; first is
    * the title (else ''). Returns struct(taxa, title). */
  def taxaDetails(r: Column): Column = {
    val named = filter(coalesce(r.getField("taxa"), array().cast(
      "array<struct<canonicalName:struct<uid:string,string:string>>>")),
      t => t.getField("canonicalName").isNotNull)
    val names = transform(named,
      t => coalesce(t.getField("canonicalName").getField("string"), lit("")))
    struct(
      when(size(names) > 0, names).as("taxa"),
      coalesce(element_at(names, 1), lit("")).as("title"))
  }

  /** `_get_meta_data` + `_create_args` (:154-194,86-98): one output
    * row per detail response that has an image; dims stringified;
    * foreign id is the image url. Input: parseDetails output. */
  def imageRows(details: DataFrame): DataFrame = {
    val r = col("r")
    val info = imageInfo(r)
    val cd = creatorDetails(r)
    val taxa = taxaDetails(r)
    details
      .withColumn("info", info)
      .filter(col("info.url").isNotNull)
      .select(
        col("info.url").as("foreign_identifier"),
        concat(lit(s"$baseUrl/image/"), r.getField("uid"))
          .as("foreign_landing_url"),
        col("info.url").as("image_url"),
        col("info.thumb").as("thumbnail_url"),
        col("info.width").cast("string").as("width"),
        col("info.height").cast("string").as("height"),
        r.getField("licenseURL").as("license_url"),
        cd.getField("creator").as("creator"),
        taxa.getField("title").as("title"),
        struct(
          taxa.getField("taxa").as("taxa"),
          cd.getField("credit_line").as("credit_line"),
          cd.getField("pub_date").as("pub_date")).as("meta_data"))
  }
}
