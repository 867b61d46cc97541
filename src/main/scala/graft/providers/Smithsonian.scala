package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Smithsonian Open Access extraction, re-expressed set-oriented.
  *
  * The reference (provider_api_scripts/smithsonian.py) walks hash
  * prefixes of the EDAN index driver-side and plucks rows one dict at
  * a time: ranked creator selection over freetext names (:295-336,
  * CREATOR_TYPES :42-101), notes -> description/label_text concat
  * (:339-363), indexedStructured tag flatten (:376-381), unit_code ->
  * sub-provider source resolution (:366-373), and CC0 media item
  * emission (:443-471).
  *
  * Here every pluck is a codegen'd Column over a declared JSON schema;
  * the per-row python becomes one projection + one explode, so the
  * same program handles one response page or the whole 155 M-row EDAN
  * dump without a driver loop.
  */
object Smithsonian {

  /** CREATOR_TYPES (smithsonian.py:42-101): label -> preference rank,
    * lower wins. */
  val creatorTypes: Map[String, Int] = Map(
    "artist" -> 0, "artist/maker" -> 0, "attributed to" -> 0, "author" -> 0,
    "created_by" -> 0, "creator" -> 0, "created by" -> 0, "model maker" -> 0,
    "modeler" -> 0, "photographer" -> 0, "photograph by" -> 0,
    "written by" -> 0,
    "architect" -> 1, "designer" -> 1, "designed by" -> 1, "illustrator" -> 1,
    "illustrated by" -> 1, "cartoonist" -> 1, "weaver" -> 1, "composer" -> 1,
    "composed by" -> 1, "embroiderer" -> 1, "landscape architect" -> 1,
    "calligrapher" -> 1, "sculptor" -> 1, "jeweler" -> 1, "potter" -> 1,
    "ceramist" -> 1,
    "compiled by" -> 2, "engraver" -> 2, "etcher" -> 2, "maker" -> 2,
    "silversmith" -> 2, "producer" -> 2, "produced by" -> 2,
    "metal worker" -> 2, "carver" -> 2, "cartographer" -> 2,
    "print maker" -> 3, "painter" -> 3, "after" -> 3, "inventor" -> 3,
    "lithographer" -> 3, "attribution" -> 3, "former attribution" -> 3,
    "manufactured by" -> 4, "manufacturer" -> 4, "published by" -> 4,
    "publisher" -> 4, "editor" -> 4,
    "patentee" -> 5,
    "collector" -> 6)

  /** DESCRIPTION_TYPES (smithsonian.py:103-107). */
  val descriptionTypes: Set[String] = Set(
    "description", "summary", "caption", "notes", "description (brief)",
    "description (spanish)", "description (brief spanish)", "gallery label",
    "exhibition label", "luce center label", "publication label",
    "new acquisition label")

  /** TAG_TYPES (smithsonian.py:108). */
  val tagTypes: Seq[String] = Seq("date", "object_type", "topic", "place")

  val zeroUrl = "https://creativecommons.org/publicdomain/zero/1.0/"

  /** Parsed shape of one EDAN search row (fields the extraction
    * consumes). */
  val rowSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |id: STRING, title: STRING,
      |content: STRUCT<
      |  descriptiveNonRepeating: STRUCT<
      |    record_link: STRING, guid: STRING, unit_code: STRING,
      |    data_source: STRING,
      |    online_media: STRUCT<media: ARRAY<STRUCT<
      |      type: STRING, content: STRING, idsId: STRING,
      |      thumbnail: STRING, usage: STRUCT<access: STRING>>>>>,
      |  indexedStructured: STRUCT<
      |    name: ARRAY<STRUCT<type: STRING, content: STRING>>,
      |    date: ARRAY<STRING>, object_type: ARRAY<STRING>,
      |    topic: ARRAY<STRING>, place: ARRAY<STRING>>,
      |  freetext: STRUCT<
      |    name: ARRAY<STRUCT<label: STRING, content: STRING>>,
      |    notes: ARRAY<STRUCT<label: STRING, content: STRING>>>>
      |>""".stripMargin.replace("\n", " "))

  val responseSchema: DataType = DataType.fromDDL(
    s"STRUCT<response: STRUCT<rowCount: BIGINT, rows: ARRAY<${rowSchema.sql}>>>")

  /** Explode raw search responses into one row per EDAN record. */
  def parseRows(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(explode(from_json(col(jsonCol), responseSchema)
      .getField("response").getField("rows")).as("row"))

  /** `_get_creator` (smithsonian.py:295-336): among freetext names
    * whose label is a known creator type (case-insensitive), with
    * non-empty content not containing 'unknown', the lowest rank wins;
    * ALL creators tied at that rank join as "a; b and c" (original
    * order). Fallback: first indexedStructured name of type
    * personal_main. */
  def creator(freetextName: Column, indexedName: Column,
      types: Map[String, Int] = creatorTypes): Column = {
    val rankMap = map(types.toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val cands = filter(
      transform(coalesce(freetextName,
        array().cast("array<struct<label:string,content:string>>")),
        (n, i) => struct(
          element_at(rankMap, lower(n.getField("label"))).as("rank"),
          i.as("ord"),
          n.getField("content").as("content"))),
      c => c.getField("rank").isNotNull &&
        c.getField("content").isNotNull &&
        length(c.getField("content")) > 0 &&
        !lower(c.getField("content")).contains("unknown"))
    // lexicographic struct sort = stable order-preserving rank sort
    val sorted = array_sort(cands)
    val top = element_at(sorted, 1).getField("rank")
    val tops = transform(
      filter(sorted, c => c.getField("rank") === top),
      _.getField("content"))
    val joined = when(size(tops) > 1,
      concat(array_join(slice(tops, lit(1), size(tops) - 1), "; "),
        lit(" and "), element_at(tops, -1)))
      .otherwise(element_at(tops, 1))
    val fallback = element_at(
      filter(coalesce(indexedName,
        array().cast("array<struct<type:string,content:string>>")),
        n => lower(n.getField("type")) === "personal_main" &&
          n.getField("content").isNotNull &&
          length(n.getField("content")) > 0), 1)
      .getField("content")
    when(size(cands) > 0, joined).otherwise(fallback)
  }

  private def notesConcat(notes: Column, labelPred: Column => Column): Column =
    trim(concat_ws(" ", transform(
      filter(coalesce(notes,
        array().cast("array<struct<label:string,content:string>>")),
        n => labelPred(lower(trim(coalesce(n.getField("label"), lit("")))))),
      n => coalesce(n.getField("content"), lit("")))))

  /** `_extract_meta_data` (smithsonian.py:339-363) as a
    * MAP<STRING,STRING>: unit_code + data_source, plus description
    * (notes with a description-ish label, space-joined) and label_text
    * ('label text' notes) when non-empty. */
  def metaData(notes: Column, unitCode: Column, dataSource: Column,
      descTypes: Set[String] = descriptionTypes): Column = {
    val desc = notesConcat(notes, l => l.isInCollection(descTypes.toSeq))
    val labelText = notesConcat(notes, l => l === "label text")
    map_filter(
      map(
        lit("unit_code"), unitCode,
        lit("data_source"), dataSource,
        lit("description"), when(length(desc) > 0, desc),
        lit("label_text"), when(length(labelText) > 0, labelText)),
      (_, v) => v.isNotNull)
  }

  /** `_extract_tags` (smithsonian.py:376-381): date ++ object_type ++
    * topic ++ place, empties dropped. */
  def tags(indexedStructured: Column): Column =
    filter(
      flatten(array(tagTypes.map(t =>
        coalesce(indexedStructured.getField(t),
          array().cast("array<string>"))): _*)),
      t => t.isNotNull && length(t) > 0)

  /** `_extract_source` (smithsonian.py:366-373): unit code ->
    * sub-provider name. Unknown codes yield null (the reference
    * raises; at the set level the caller audits nulls instead of
    * aborting the batch on one bad row). */
  def source(unitCode: Column): Column = {
    val inv = ProviderDetails.invert(ProviderDetails.smithsonianSubProviders)
    val m = map(inv.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    element_at(m, trim(unitCode))
  }

  /** Full extraction: one image row per CC0 'Images' media item
    * (`_process_image_list`, smithsonian.py:443-471), carrying the
    * row-level creator/meta/tags/source. Input: parseRows output. */
  def imageRows(rows: DataFrame): DataFrame = {
    val dnr = col("row.content.descriptiveNonRepeating")
    val is = col("row.content.indexedStructured")
    val ft = col("row.content.freetext")
    val enriched = rows.select(
      coalesce(dnr.getField("record_link"), dnr.getField("guid"))
        .as("foreign_landing_url"),
      col("row.title").as("title"),
      creator(ft.getField("name"), is.getField("name")).as("creator"),
      metaData(ft.getField("notes"), dnr.getField("unit_code"),
        dnr.getField("data_source")).as("meta_data"),
      tags(is).as("tags"),
      source(dnr.getField("unit_code")).as("source"),
      coalesce(dnr.getField("online_media").getField("media"),
        array().cast(
          "array<struct<type:string,content:string,idsId:string," +
            "thumbnail:string,usage:struct<access:string>>>"))
        .as("media"))
    enriched
      .select(col("*"), explode(col("media")).as("m"))
      .filter(col("m.type") === "Images" && col("m.usage.access") === "CC0")
      .select(
        col("m.idsId").as("foreign_identifier"),
        col("foreign_landing_url"),
        col("m.content").as("image_url"),
        col("m.thumbnail").as("thumbnail_url"),
        lit(zeroUrl).as("license_url"),
        col("title"), col("creator"), col("meta_data"), col("tags"),
        col("source"))
  }
}
