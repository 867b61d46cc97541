package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Europeana search-API extraction, re-expressed set-oriented
  * (provider_api_scripts/europeana.py).
  *
  * The reference cursors through search pages driver-side and plucks
  * each item dict: CC license pick from the rights array (:203-209),
  * edmIsShownAt-else-guid landing URL (:212-217), language-aware
  * description fallback en -> def -> dcDescription -> '' (:232-250),
  * and inline sub-provider resolution from the dataProvider array
  * (:182-189 — the same rule Maintenance.updateEuropeanaSubProviders
  * applies at the database level). Here each pluck is a Column over
  * the declared item schema; one projection handles any number of
  * pages.
  */
object Europeana {

  val itemSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |id: STRING, guid: STRING,
      |rights: ARRAY<STRING>,
      |edmIsShownBy: ARRAY<STRING>, edmIsShownAt: ARRAY<STRING>,
      |edmPreview: ARRAY<STRING>, title: ARRAY<STRING>,
      |country: ARRAY<STRING>, dataProvider: ARRAY<STRING>,
      |dcDescriptionLangAware: STRUCT<en: ARRAY<STRING>, def: ARRAY<STRING>>,
      |dcDescription: ARRAY<STRING>
      |>""".stripMargin.replace("\n", " "))

  val responseSchema: DataType = DataType.fromDDL(
    s"""STRUCT<success: BOOLEAN, nextCursor: STRING, totalResults: BIGINT,
       |items: ARRAY<${itemSchema.sql}>>""".stripMargin.replace("\n", " "))

  /** Explode raw search responses into one row per item. */
  def parseItems(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(explode(from_json(col(jsonCol), responseSchema)
      .getField("items")).as("item"))

  /** Parse standalone item dicts (one JSON per row). */
  def parseItem(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(from_json(col(jsonCol), itemSchema).as("item"))

  /** `_get_license_url` (europeana.py:203-209): first rights entry
    * containing 'creativecommons'. */
  def licenseUrl(rights: Column): Column =
    element_at(filter(coalesce(rights, array().cast("array<string>")),
      r => r.contains("creativecommons")), 1)

  /** `_get_description` (europeana.py:232-250): en -> def ->
    * dcDescription -> '', trimmed. */
  def description(item: Column): Column = {
    val langAware = item.getField("dcDescriptionLangAware")
    trim(coalesce(
      element_at(langAware.getField("en"), 1),
      element_at(langAware.getField("def"), 1),
      element_at(item.getField("dcDescription"), 1),
      lit("")))
  }

  /** Full extraction over parseItems/parseItem output: one image row
    * per item with the reference's field plucks and the inline
    * sub-provider source (europeana.py:163-200). */
  def imageRows(items: DataFrame,
      subProviders: Map[String, String] =
        ProviderDetails.europeanaSubProviders): DataFrame = {
    val it = col("item")
    val eligible = filter(
      array(subProviders.toSeq.map { case (sub, dp) =>
        struct(lit(sub).as("sub"), lit(dp).as("dp"))
      }: _*),
      s => array_contains(it.getField("dataProvider"), s.getField("dp")))
    val metaStruct = struct(
      it.getField("country").as("country"),
      it.getField("dataProvider").as("dataProvider"),
      description(it).as("description"))
    items.select(
      it.getField("id").as("foreign_identifier"),
      coalesce(element_at(it.getField("edmIsShownAt"), 1),
        it.getField("guid")).as("foreign_landing_url"),
      element_at(it.getField("edmIsShownBy"), 1).as("image_url"),
      element_at(it.getField("edmPreview"), 1).as("thumbnail_url"),
      licenseUrl(it.getField("rights")).as("license_url"),
      element_at(it.getField("title"), 1).as("title"),
      metaStruct.getField("country").as("country"),
      metaStruct.getField("dataProvider").as("data_provider"),
      metaStruct.getField("description").as("description"),
      when(size(eligible) > 1,
        raise_error(concat(
          lit("More than one sub-provider identified for the image "
            + "with foreign ID "), it.getField("id"))))
        .when(size(eligible) === 1, element_at(eligible, 1).getField("sub"))
        .otherwise(lit(ProviderDetails.EuropeanaDefaultProvider)).as("source"),
      to_json(metaStruct).as("meta_data_json"))
  }
}
