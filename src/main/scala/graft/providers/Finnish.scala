package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Finnish Museums (Finna) extraction, set-oriented.
  *
  * The reference (provider_api_scripts/finnish_museums.py) walks
  * per-building search pages (status=ok gate, :78-89) and emits one
  * row per relative image path: API-prefixed image URLs (:146-150),
  * record-id landing pages (:138-143), a flattened nested subject
  * list as tags (:128-135), and a buildings[0] -> sub-provider source
  * lookup (:101-110, provider_details.py:28-33).
  */
object Finnish {

  val provider = ProviderDetails.FinnishDefaultProvider
  val apiUrl = "https://api.finna.fi"
  val landingUrl = "https://www.finna.fi/Record/"

  /** Parsed shape of one record (fields the extraction consumes). */
  val recordSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |id: STRING, title: STRING,
      |buildings: ARRAY<STRUCT<value: STRING>>,
      |imageRights: STRUCT<copyright: STRING, link: STRING>,
      |images: ARRAY<STRING>,
      |subjects: ARRAY<ARRAY<STRING>>
      |>""".stripMargin.replace("\n", " "))

  val responseSchema: DataType = DataType.fromDDL(
    s"STRUCT<status: STRING, records: ARRAY<${recordSchema.sql}>>"
      .replace("\n", " "))

  /** `_get_object_list_from_json` (finnish_museums.py:78-89): records
    * of status=ok responses, one row per record. */
  def parseRecords(raw: DataFrame, jsonCol: String): DataFrame = {
    val parsed = from_json(col(jsonCol), responseSchema)
    raw.select(parsed.as("resp"))
      .filter(lower(col("resp.status")) === "ok")
      .select(explode(col("resp.records")).as("rec"))
  }

  /** `_get_raw_tags` (:128-135): flatten the nested subject lists;
    * missing subjects -> null. */
  def rawTags(subjects: Column): Column =
    when(subjects.isNotNull, flatten(subjects))

  /** buildings[0] -> sub-provider, default provider (:108-110). */
  def source(buildings: Column): Column = {
    val inv = ProviderDetails.finnishSubProviders.map(_.swap)
    val m = map(inv.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    coalesce(
      element_at(m, element_at(buildings, 1).getField("value")),
      lit(provider))
  }

  /** `_process_object` (:101-125): one row per relative image path,
    * with the API prefix and record-id landing URL. Input:
    * parseRecords output. */
  def imageRows(records: DataFrame): DataFrame = {
    val rec = col("rec")
    records
      .select(rec, explode(coalesce(rec.getField("images"),
        array().cast("array<string>"))).as("img"))
      .select(
        rec.getField("imageRights").getField("link").as("license_url"),
        rec.getField("id").as("foreign_identifier"),
        when(rec.getField("id").isNotNull &&
          length(rec.getField("id")) > 0,
          concat(lit(landingUrl), rec.getField("id")))
          .as("foreign_landing_url"),
        when(col("img").isNotNull && length(col("img")) > 0,
          concat(lit(apiUrl), col("img"))).as("image_url"),
        rec.getField("title").as("title"),
        source(rec.getField("buildings")).as("source"),
        rawTags(rec.getField("subjects")).as("tags"))
  }
}
