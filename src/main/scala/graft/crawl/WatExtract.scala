package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-A flagship: scan WAT metadata records, keep pages that link
  * to creativecommons.org, and emit one row per (page, CC link) with
  * per-page link stats — ExtractCCLinks.py:98-227 re-expressed as a
  * typed Dataset pipeline (S2/P1-P4/A1).
  *
  * The reference streams WAT files over HTTP inside mapPartitions at
  * 2500-way parallelism; here the input is a Dataset of WAT JSON
  * envelope lines (locally: spark.read.text over fixture files — the
  * same shape, minus the network). There is NO shuffle anywhere in
  * this job: scan -> flatMap -> write, exactly like the reference's
  * single-pass design (SURVEY §3.1).
  */
object WatExtract {

  /** One CC link occurrence (ExtractCCLinks.py:212-223's schema). */
  final case class CCLink(
      provider_domain: String,
      content_path: String,
      content_query_string: String,
      cc_domain: String,
      cc_path: String,
      warc_segment: String,
      warc_filename: String,
      content_offset: Long,
      deflate_length: Long,
      html_metadata: String)

  /** S1: the WAT-paths manifest (ExtractCCLinks.py:64-95) — a
    * (possibly gzipped) text file of archive keys. spark.read.text
    * decompresses .gz transparently; blank lines dropped. The
    * reference pulls this over HTTP and parallelizes the list; the
    * engine reads it as a one-column Dataset that seeds the scan. */
  def loadManifest(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(path).filter(_.trim.nonEmpty)
  }

  /** P1: record filter — WAT envelopes only (JSON content, response
    * records with HTML link metadata), then per-page link extraction.
    * Implemented over a parsed WAT JSON DataFrame. */
  def extract(spark: SparkSession, watLines: Dataset[String]): DataFrame = {
    import spark.implicits._

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      """Container STRUCT<Filename: STRING, Offset: STRING, `Gzip-Metadata`: STRUCT<`Deflate-Length`: STRING>>,
        |Envelope STRUCT<
        |  `WARC-Header-Metadata` STRUCT<`WARC-Type`: STRING, `WARC-Target-URI`: STRING>,
        |  `Payload-Metadata` STRUCT<`Actual-Content-Type`: STRING,
        |    `HTTP-Response-Metadata` STRUCT<`HTML-Metadata` STRUCT<
        |      Links ARRAY<STRUCT<url: STRING, path: STRING>>>>>>""".stripMargin
        .replace("\n", " "))

    val parsed = watLines.toDF("line")
      .select(from_json(col("line"), schema).as("r"))
      .select(
        col("r.Envelope.`WARC-Header-Metadata`.`WARC-Type`").as("warc_type"),
        col("r.Envelope.`WARC-Header-Metadata`.`WARC-Target-URI`").as("target_uri"),
        col("r.Envelope.`Payload-Metadata`.`Actual-Content-Type`").as("content_type"),
        col("r.Envelope.`Payload-Metadata`.`HTTP-Response-Metadata`.`HTML-Metadata`.Links").as("links"),
        col("r.Container.Filename").as("warc_filename"),
        col("r.Container.Offset").cast("long").as("content_offset"),
        col("r.Container.`Gzip-Metadata`.`Deflate-Length`").cast("long").as("deflate_length"))

    // P1 (ExtractCCLinks.py:153,163-168)
    val pages = parsed.filter(
      col("warc_type") === "response" &&
        col("content_type").contains("application/json") &&
        col("links").isNotNull && size(col("links")) > 0)

    // A1 per-page stats (ExtractCCLinks.py:181-184): distinct image
    // count + external-anchor domain histogram, embedded as JSON.
    val imgCount = size(array_distinct(transform(
      filter(col("links"), l => l.getField("path") === "IMG@/src"),
      l => l.getField("url"))))
    val anchorDomains = transform(
      filter(col("links"), l =>
        l.getField("path") === "A@/href" &&
          parse_url(l.getField("url"), lit("HOST")).isNotNull &&
          parse_url(l.getField("url"), lit("HOST")) =!=
            parse_url(col("target_uri"), lit("HOST"))),
      l => parse_url(l.getField("url"), lit("HOST")))
    // anchorDomains is materialized as a column BEFORE the histogram
    // lambda references it: a lambda body re-evaluates an inlined
    // expression per element (no subexpression elimination in
    // interpreted lambdas), which here would re-run the whole
    // filter+parse_url chain once per distinct domain per page.
    val domainHist = map_from_entries(transform(
      array_distinct(col("__anchor_domains")),
      h => struct(h, size(filter(col("__anchor_domains"), x => x === h)))))

    val withMeta = pages
      .withColumn("__anchor_domains", anchorDomains)
      .withColumn("html_metadata",
        to_json(struct(imgCount.as("Images"), domainHist.as("Links"))))
      .drop("__anchor_domains")

    // P2/P3: explode links, keep creativecommons.org targets
    // (ExtractCCLinks.py:186) -> P4 projection.
    withMeta
      .select(col("target_uri"), col("warc_filename"), col("content_offset"),
        col("deflate_length"), col("html_metadata"),
        explode(col("links")).as("link"))
      .filter(col("link.url").contains("creativecommons.org"))
      .select(
        parse_url(col("target_uri"), lit("HOST")).as("provider_domain"),
        parse_url(col("target_uri"), lit("PATH")).as("content_path"),
        coalesce(parse_url(col("target_uri"), lit("QUERY")), lit(""))
          .as("content_query_string"),
        parse_url(col("link.url"), lit("HOST")).as("cc_domain"),
        parse_url(col("link.url"), lit("PATH")).as("cc_path"),
        regexp_extract(col("warc_filename"), "^([^/]+)/", 1).as("warc_segment"),
        regexp_extract(col("warc_filename"), "([^/]+)$", 1).as("warc_filename"),
        col("content_offset"), col("deflate_length"),
        col("html_metadata"))
  }

  /** A2/O1: the top-domains summary the reference asserts on
    * (tests/test_ExtractCCLinks.py:236).
    *
    * Distinct counts via the shared
    * [[graft.Aggregates.withDistinctCounts]] — the two-level shape
    * whose rationale (the Expand plan's measured 600M-row heap death)
    * and null semantics (null keys don't count; a null DOMAIN is a
    * real group, preserved by the helper's null-safe join — WAT
    * records with host-less target URIs land there) live with the
    * one definition. This is the query that actually runs over a
    * multi-crawl link history, the scale the matrix was measured
    * for. */
  def topDomains(links: DataFrame, limit: Int = 100): DataFrame =
    graft.Aggregates.withDistinctCounts(links, "provider_domain",
        "total", Seq("content_path" -> "distinct_paths",
          "content_query_string" -> "distinct_queries"))
      .orderBy(desc("total"), asc("provider_domain"))
      .limit(limit)

  /** P5/P6/D1: the provider-slice read-back over the phase-A parquet
    * (Provider.py:256-264): suffix-match the provider domain, rebuild
    * the page URL, dedupe on it — all before any expensive work
    * (SURVEY §4: dedupe placement is load-bearing). */
  def providerSlice(links: DataFrame, domain: String): DataFrame =
    links
      .where(col("provider_domain").like(s"%$domain"))
      .select(
        concat(col("provider_domain"), col("content_path"),
          when(col("content_query_string") =!= "",
            concat(lit("?"), col("content_query_string"))).otherwise(""))
          .as("url"),
        concat(col("warc_segment"), lit("/warc/"), col("warc_filename"))
          .as("warc_path"),
        col("content_offset"), col("deflate_length"))
      .dropDuplicates("url")
}
