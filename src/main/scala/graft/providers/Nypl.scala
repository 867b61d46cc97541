package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** New York Public Library extraction, set-oriented.
  *
  * The reference (provider_api_scripts/nypl.py) fetches item details
  * per search uuid and emits one row per sibling capture: the image
  * is the first available of the t= dimension codes g,v,q,w,r and the
  * thumbnail the first of w,r,q,f,v,g with `&download=1` stripped
  * (:37-43,191-215), title from titleInfo[0] (:168-172), creator from
  * the first usage=primary name (:175-188), and a conditional
  * metadata dict whose python type-checks map onto strict-schema
  * parse nulls (:218-248).
  */
object Nypl {

  val provider = "nypl"

  val imageUrlDimensions: Seq[String] = Seq("g", "v", "q", "w", "r")
  val thumbnailDimensions: Seq[String] = Seq("w", "r", "q", "f", "v", "g")

  private val s = "STRUCT<`$`: STRING>"
  private val capture =
    s"""STRUCT<
       |imageID: $s,
       |imageLinks: STRUCT<imageLink: ARRAY<$s>>,
       |itemLink: $s,
       |rightsStatementURI: $s>""".stripMargin.replace("\n", " ")

  private def detailsDdl(captureShape: String): String =
    s"""STRUCT<nyplAPI: STRUCT<response: STRUCT<
       |mods: STRUCT<
       |  titleInfo: ARRAY<STRUCT<title: $s>>,
       |  name: ARRAY<STRUCT<usage: STRING, namePart: $s>>,
       |  typeOfResource: ARRAY<STRUCT<usage: STRING, `$$`: STRING>>,
       |  genre: $s,
       |  originInfo: STRUCT<dateIssued: $s, publisher: $s>,
       |  physicalDescription: STRUCT<note: $s>>,
       |sibling_captures: STRUCT<capture: $captureShape>>>>"""
      .stripMargin.replace("\n", " ")

  /** Item-details schema with the usual list of captures. */
  val detailsSchema: DataType =
    DataType.fromDDL(detailsDdl(s"ARRAY<$capture>"))

  /** Variant for the API's single-capture responses (a bare dict
    * where the list usually sits, nypl.py:123-125). */
  val detailsSingleSchema: DataType =
    DataType.fromDDL(detailsDdl(capture))

  /** One row per item-details document: `mods` plus a normalized
    * `captures` array (single-dict payloads become one-element
    * arrays). */
  def parseItems(raw: DataFrame, jsonCol: String): DataFrame = {
    val asList = from_json(col(jsonCol), detailsSchema)
      .getField("nyplAPI").getField("response")
    val asOne = from_json(col(jsonCol), detailsSingleSchema)
      .getField("nyplAPI").getField("response")
    val single = asOne.getField("sibling_captures").getField("capture")
    raw.select(
      coalesce(asList.getField("mods"), asOne.getField("mods")).as("mods"),
      coalesce(
        asList.getField("sibling_captures").getField("capture"),
        when(single.isNotNull, array(single))).as("captures"))
  }

  /** `_get_title` (nypl.py:168-172). */
  def title(titleInfo: Column): Column =
    element_at(titleInfo, 1).getField("title").getField("$")

  /** `_get_creators` (:175-188): first usage=primary namePart. */
  def creators(nameInfo: Column): Column =
    element_at(filter(coalesce(nameInfo, array().cast(
      "array<struct<usage:string,namePart:struct<`$`:string>>>")),
      n => n.getField("usage") === "primary"), 1)
      .getField("namePart").getField("$")

  /** `_get_images`/`_get_preferred_image` (:191-215): index capture
    * links by their t= query code (last wins, like the python dict
    * build) and take the first preferred dimension, stripping the
    * download flag. */
  def preferredImage(imageLinks: Column, dims: Seq[String]): Column = {
    val links = coalesce(imageLinks,
      array().cast("array<struct<`$`:string>>"))
    val byCode = (dim: String) => element_at(filter(links,
      l => parse_url(l.getField("$"), lit("QUERY"), lit("t")) === dim), -1)
      .getField("$")
    regexp_replace(coalesce(dims.map(byCode): _*), "&download=1", "")
  }

  /** `_get_metadata` (:218-248): keys appear only when the pluck
    * path parses — the python type checks ARE the schema here. */
  def metaData(mods: Column): Column = {
    val tor = coalesce(mods.getField("typeOfResource"),
      array().cast("array<struct<usage:string,`$`:string>>"))
    val first = element_at(tor, 1)
    map_filter(
      map(
        lit("type_of_resource"),
        when(first.getField("usage") === "primary", first.getField("$")),
        lit("genre"), mods.getField("genre").getField("$"),
        lit("date_issued"),
        mods.getField("originInfo").getField("dateIssued").getField("$"),
        lit("publisher"),
        mods.getField("originInfo").getField("publisher").getField("$"),
        lit("description"),
        mods.getField("physicalDescription").getField("note").getField("$")),
      (_, v) => v.isNotNull)
  }

  /** `_get_capture_details` (:135-165): one row per capture with
    * image id, landing url, license url and a resolvable image. */
  def imageRows(items: DataFrame): DataFrame = {
    val mods = col("mods")
    val c = col("c")
    items
      .select(mods, explode(coalesce(col("captures"),
        array().cast(s"array<${DataType.fromDDL(capture).sql}>"))).as("c"))
      .select(
        c.getField("imageID").getField("$").as("foreign_identifier"),
        c.getField("itemLink").getField("$").as("foreign_landing_url"),
        preferredImage(c.getField("imageLinks").getField("imageLink"),
          imageUrlDimensions).as("image_url"),
        preferredImage(c.getField("imageLinks").getField("imageLink"),
          thumbnailDimensions).as("thumbnail_url"),
        c.getField("rightsStatementURI").getField("$").as("license_url"),
        title(mods.getField("titleInfo")).as("title"),
        creators(mods.getField("name")).as("creator"),
        metaData(mods).as("meta_data"))
      .filter(col("foreign_identifier").isNotNull &&
        col("image_url").isNotNull &&
        col("foreign_landing_url").isNotNull &&
        col("license_url").isNotNull)
  }
}
