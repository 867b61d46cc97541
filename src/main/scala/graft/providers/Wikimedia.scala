package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Wikimedia Commons API extraction, re-expressed set-oriented.
  *
  * The reference (provider_api_scripts/wikimedia_commons.py) walks the
  * MediaWiki API driver-side: it pages with continuation tokens,
  * MERGING partial page records across responses — `globalusage`
  * arrays concatenate, every other field takes the later response's
  * value (wikimedia_commons.py:185-222) — until `batchcomplete`, then
  * plucks image rows (mediatype gate :259-269, Artist-HTML creator
  * :289-305, meta_data dict :330-352).
  *
  * Spark-first shape: responses land as (seq, json) rows — seq is the
  * continuation index within a batch — and the merge is ONE
  * hash-aggregate keyed by page id over all responses; field
  * resolution and extraction are pure codegen'd expressions. The same
  * plan merges one batch or a million batches; nothing grows with the
  * corpus but the shuffle.
  */
object Wikimedia {

  /** Parsed shape of one `query.pages` entry (the fields the
    * extraction consumes; from_json drops the rest). */
  val pageSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |pageid: BIGINT, ns: INT, title: STRING, imagerepository: STRING,
      |imageinfo: ARRAY<STRUCT<
      |  user: STRING, size: BIGINT, width: BIGINT, height: BIGINT,
      |  url: STRING, descriptionurl: STRING, descriptionshorturl: STRING,
      |  mediatype: STRING,
      |  extmetadata: STRUCT<
      |    DateTime: STRUCT<value: STRING>,
      |    ObjectName: STRUCT<value: STRING>,
      |    Categories: STRUCT<value: STRING>,
      |    ImageDescription: STRUCT<value: STRING>,
      |    DateTimeOriginal: STRUCT<value: STRING>,
      |    Artist: STRUCT<value: STRING>,
      |    LicenseUrl: STRUCT<value: STRING>,
      |    License: STRUCT<value: STRING>>>>,
      |globalusage: ARRAY<STRUCT<title: STRING, wiki: STRING, url: STRING>>
      |>""".stripMargin.replace("\n", " "))

  /** Full response: continuation token + pages keyed by page id. */
  val responseSchema: DataType = {
    val page = pageSchema.sql
    DataType.fromDDL(
      s"""STRUCT<
         |batchcomplete: STRING,
         |continue: STRUCT<gaicontinue: STRING, gucontinue: STRING, continue: STRING>,
         |query: STRUCT<pages: MAP<STRING, $page>>
         |>""".stripMargin.replace("\n", " "))
  }

  /** Explode raw API responses into (seq, page_key, page) rows.
    * `seqCol` orders responses within one continuation run (the
    * reference's loop index); `batchCols` carry any extra grouping
    * (e.g. the date partition) through to the merge. */
  def parseResponses(raw: DataFrame, seqCol: String, jsonCol: String,
      batchCols: Seq[String] = Nil): DataFrame = {
    val parsed = raw.select(
      batchCols.map(col) ++ Seq(
        col(seqCol).cast("long").as("__seq"),
        from_json(col(jsonCol), responseSchema).as("__r")): _*)
    parsed.select(
      batchCols.map(col) ++ Seq(
        col("__seq"),
        explode(col("__r.query.pages"))): _*)
      .withColumnRenamed("key", "page_key")
      .withColumnRenamed("value", "page")
  }

  /** Parse standalone page dicts (one JSON page per row) — the unit
    * the reference's page-level tests exercise. */
  def parsePages(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(from_json(col(jsonCol), pageSchema).as("page"))
      .select(lit(0L).as("__seq"),
        col("page.pageid").cast("string").as("page_key"), col("page"))

  private val scalarFields =
    Seq("pageid", "ns", "title", "imagerepository", "imageinfo")

  /** The continuation merge (wikimedia_commons.py:185-222) as one
    * aggregate: per page id, `globalusage` is the in-order
    * concatenation across responses; every other field is the LAST
    * response's value where present (dict.update semantics — a later
    * response lacking the field keeps the earlier value). */
  def mergePages(pages: DataFrame, batchCols: Seq[String] = Nil): DataFrame = {
    val keyCols = (batchCols :+ "page_key").map(col)
    val collected = pages
      .groupBy(keyCols: _*)
      .agg(sort_array(collect_list(struct(col("__seq"), col("page"))))
        .as("hist"))
    def lastPresent(field: String): Column =
      element_at(
        filter(reverse(col("hist")),
          h => h.getField("page").getField(field).isNotNull), 1)
        .getField("page").getField(field).as(field)
    val gu = flatten(transform(col("hist"),
      h => coalesce(h.getField("page").getField("globalusage"),
        array().cast("array<struct<title:string,wiki:string,url:string>>"))))
      .as("globalusage")
    collected.select(keyCols ++ scalarFields.map(lastPresent) :+ gu: _*)
  }

  /** `_cleanse_url` (wikimedia_commons.py:355-368): scheme-relative
    * URLs get https for the commons host and http otherwise; bare
    * scheme-less paths get http. Full URLs pass through. */
  def cleanseUrl(u: Column): Column =
    when(u.isNull || length(u) === 0, lit(null))
      .when(u.startsWith("//commons.wikimedia.org"), concat(lit("https:"), u))
      .when(u.startsWith("//"), concat(lit("http:"), u))
      .when(!u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), concat(lit("http://"), u))
      .otherwise(u)

  private def stripHtml(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "\\s+", " "))

  /** Image-row extraction over merged pages (the set-oriented
    * `_process_image_data`, wikimedia_commons.py:225-247 + the
    * meta_data build :330-352). Pages whose first imageinfo mediatype
    * is not in `imageMediatypes` are dropped (the P9 gate,
    * :259-269). */
  def imageRows(merged: DataFrame,
      imageMediatypes: Seq[String] = Seq("BITMAP")): DataFrame = {
    val ii = element_at(col("imageinfo"), 1)
    def extVal(name: String): Column =
      ii.getField("extmetadata").getField(name).getField("value")
    val artist = extVal("Artist")
    // creator is the rendered text of the Artist HTML; creator_url is
    // its first link target, cleansed
    val artistText = stripHtml(artist)
    val href = regexp_extract(artist, "href=\"([^\"]+)\"", 1)
    val description = extVal("ImageDescription")
    val metaStruct = struct(
      when(description.isNotNull && length(stripHtml(description)) > 0,
        stripHtml(description)).as("description"),
      coalesce(size(col("globalusage")), lit(0)).as("global_usage_count"),
      coalesce(extVal("DateTimeOriginal"), lit("")).as("date_originally_created"),
      coalesce(extVal("DateTime"), lit("")).as("last_modified_at_source"),
      split(coalesce(extVal("Categories"), lit("")), "\\|").as("categories"))
    merged
      .filter(ii.getField("mediatype").isin(imageMediatypes: _*))
      .select(
        col("pageid").cast("string").as("foreign_identifier"),
        ii.getField("descriptionshorturl").as("foreign_landing_url"),
        ii.getField("url").as("image_url"),
        trim(extVal("LicenseUrl")).as("license_url"),
        ii.getField("width").cast("int").as("width"),
        ii.getField("height").cast("int").as("height"),
        when(length(artistText) > 0, artistText).as("creator"),
        when(length(href) > 0, cleanseUrl(href)).as("creator_url"),
        col("title"),
        metaStruct.getField("description").as("meta_description"),
        metaStruct.getField("global_usage_count").as("global_usage_count"),
        metaStruct.getField("date_originally_created").as("date_originally_created"),
        metaStruct.getField("last_modified_at_source").as("last_modified_at_source"),
        metaStruct.getField("categories").as("categories"),
        to_json(metaStruct).as("meta_data_json"))
  }

  /** End-to-end: raw continuation responses -> merged -> image rows. */
  def extract(raw: DataFrame, seqCol: String, jsonCol: String,
      batchCols: Seq[String] = Nil,
      imageMediatypes: Seq[String] = Seq("BITMAP")): DataFrame =
    imageRows(mergePages(parseResponses(raw, seqCol, jsonCol, batchCols),
      batchCols), imageMediatypes)
}
