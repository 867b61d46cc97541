package graft.crawl

import graft.SparkSpec

/** Flagship extract pipeline over an inline WAT-shaped fixture —
  * golden rows equivalent in spirit to tests/test_ExtractCCLinks.py
  * :80-102 (record filtering, link predicate, projection, per-page
  * stats) and the A2 summary at :236. */
class WatExtractSpec extends SparkSpec {
  import spark.implicits._

  private def watLine(uri: String, warcType: String, contentType: String,
      links: Seq[(String, String)], filename: String = "seg-1/wat/f1.warc.gz",
      offset: Long = 100, deflate: Long = 50): String = {
    val linksJson = links.map { case (url, path) =>
      s"""{"url": "$url", "path": "$path"}"""
    }.mkString("[", ",", "]")
    s"""{"Container": {"Filename": "$filename", "Offset": "$offset",
       | "Gzip-Metadata": {"Deflate-Length": "$deflate"}},
       | "Envelope": {"WARC-Header-Metadata":
       |   {"WARC-Type": "$warcType", "WARC-Target-URI": "$uri"},
       |  "Payload-Metadata": {"Actual-Content-Type": "application/json",
       |   "HTTP-Response-Metadata": {"HTML-Metadata":
       |     {"Links": $linksJson}}}}}""".stripMargin.replace("\n", "")
  }

  private val fixture = Seq(
    // a page with one CC anchor + one image + one external anchor
    watLine("https://blog.example.org/post?id=1", "response", "application/json",
      Seq(
        ("https://creativecommons.org/licenses/by/4.0/", "A@/href"),
        ("https://img.example.org/x.jpg", "IMG@/src"),
        ("https://other.site.net/page", "A@/href"))),
    // a second page, same domain, two CC links
    watLine("https://blog.example.org/other", "response", "application/json",
      Seq(
        ("https://creativecommons.org/licenses/by-sa/3.0/", "A@/href"),
        ("https://creativecommons.org/publicdomain/zero/1.0/", "A@/href"))),
    // filtered: request record
    watLine("https://blog.example.org/req", "request", "application/json",
      Seq(("https://creativecommons.org/licenses/by/4.0/", "A@/href"))),
    // filtered: response without CC links
    watLine("https://nolinks.example.org/", "response", "application/json",
      Seq(("https://elsewhere.org/x", "A@/href"))))

  private lazy val links = WatExtract.extract(spark, spark.createDataset(fixture))

  test("record filter + CC-link predicate keep exactly the CC rows (P1/P2)") {
    val rows = links.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[String]("cc_domain") == "creativecommons.org"))
  }

  test("projection carries WARC coordinates and URL parts (P4/S3 contract)") {
    val r = links.filter("content_query_string = 'id=1'").collect().head
    assert(r.getAs[String]("provider_domain") == "blog.example.org")
    assert(r.getAs[String]("content_path") == "/post")
    assert(r.getAs[String]("cc_path") == "/licenses/by/4.0/")
    assert(r.getAs[String]("warc_segment") == "seg-1")
    assert(r.getAs[Long]("content_offset") == 100L)
    assert(r.getAs[Long]("deflate_length") == 50L)
  }

  test("per-page stats embed image count and external-domain histogram (A1)") {
    val meta = links.filter("content_query_string = 'id=1'")
      .collect().head.getAs[String]("html_metadata")
    assert(meta.contains("\"Images\":1"))
    assert(meta.contains("\"other.site.net\":1"))
    // the CC anchor is external too — counted in the histogram
    assert(meta.contains("\"creativecommons.org\":1"))
  }

  test("top-domains summary aggregates correctly (A2/O1)") {
    val top = WatExtract.topDomains(links).collect()
    assert(top.length == 1)
    val r = top.head
    assert(r.getAs[String]("provider_domain") == "blog.example.org")
    assert(r.getAs[Long]("total") == 3L)
    assert(r.getAs[Long]("distinct_paths") == 2L)
  }

  test("manifest loader reads gzipped path lists, drops blanks (S1)") {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/wat.paths.gz"))
    gz.write("seg-1/wat/a.warc.wat.gz\n\nseg-2/wat/b.warc.wat.gz\n".getBytes)
    gz.close()
    val paths = WatExtract.loadManifest(spark, s"$dir/wat.paths.gz").collect()
    assert(paths.toSeq == Seq("seg-1/wat/a.warc.wat.gz", "seg-2/wat/b.warc.wat.gz"))
  }

  test("provider slice rebuilds URLs, suffix-matches domain, dedupes (P5/D1)") {
    val slice = WatExtract.providerSlice(links, "example.org").collect()
    assert(slice.length == 2) // two distinct page urls
    val urls = slice.map(_.getAs[String]("url")).toSet
    assert(urls == Set("blog.example.org/post?id=1", "blog.example.org/other"))
    assert(slice.forall(_.getAs[String]("warc_path") ==
      "seg-1/warc/f1.warc.gz"))
    assert(WatExtract.providerSlice(links, "example.net").count() == 0)
  }
}
