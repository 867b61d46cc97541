package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Wikimedia Commons extraction,
  * pinned against the reference's own fixture JSONs
  * (provider_api_scripts/tests/resources/wikimedia) and the expected
  * values hard-coded in the reference's test_wikimedia_commons.py.
  * Fixtures are read from the read-only reference checkout; tests
  * self-cancel if it is absent. */
class WikimediaSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/wikimedia"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  test("golden image row from image_data_example.json " +
      "(test_wikimedia_commons.py test_process_image_data_handles_example_dict)") {
    val page = fixture("image_data_example.json")
    val merged = Wikimedia.mergePages(
      Wikimedia.parsePages(Seq(page).toDF("json"), "json"))
    val out = Wikimedia.imageRows(merged).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("foreign_identifier") == "81754323")
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://commons.wikimedia.org/w/index.php?curid=81754323")
    assert(r.getAs[String]("image_url") ==
      "https://upload.wikimedia.org/wikipedia/commons/2/25/" +
        "20120925_PlozevetBretagne_LoneTree_DSC07971_PtrQs.jpg")
    assert(r.getAs[String]("license_url") ==
      "https://creativecommons.org/licenses/by-sa/4.0")
    assert(r.getAs[Int]("width") == 5514)
    assert(r.getAs[Int]("height") == 3102)
    assert(r.getAs[String]("creator") == "PtrQs")
    assert(r.getAs[String]("creator_url") ==
      "https://commons.wikimedia.org/wiki/User:PtrQs")
    assert(r.getAs[String]("title") ==
      "File:20120925 PlozevetBretagne LoneTree DSC07971 PtrQs.jpg")
    assert(r.getAs[String]("meta_description") == "SONY DSC")
    assert(r.getAs[Int]("global_usage_count") == 0)
    assert(r.getAs[String]("date_originally_created") == "2012-09-25 16:23:02")
    assert(r.getAs[String]("last_modified_at_source") == "2019-09-01 00:38:47")
    assert(r.getSeq[String](r.fieldIndex("categories")) == Seq(
      "Coasts of Plozévet", "No QIC by usr:PtrQs",
      "Photographs taken with Minolta AF Zoom 28-70mm F2.8 G",
      "Self-published work", "Taken with Sony DSLR-A900",
      "Trees in Finistère"))
  }

  test("non-BITMAP mediatype pages are dropped (P9 gate, " +
      "wikimedia_commons.py:259-269)") {
    val audio =
      """{"pageid": 1, "title": "File:x.ogg", "imageinfo": [
        |{"url": "https://u", "descriptionshorturl": "https://d",
        |"mediatype": "AUDIO", "extmetadata": {}}]}""".stripMargin
    val merged = Wikimedia.mergePages(
      Wikimedia.parsePages(Seq(audio).toDF("json"), "json"))
    assert(Wikimedia.imageRows(merged).count() == 0)
    assert(Wikimedia.imageRows(merged,
      imageMediatypes = Seq("BITMAP", "AUDIO")).count() == 1)
  }

  test("page-level continuation merge equals the reference's merged " +
      "fixture (page_44672212, _merge_image_pages)") {
    val df = Seq(
      (0L, fixture("continuation/page_44672212_left.json")),
      (1L, fixture("continuation/page_44672212_right.json")))
      .toDF("seq", "json")
      .select(col("seq").as("__seq"),
        from_json(col("json"), Wikimedia.pageSchema).as("page"))
      .select(col("__seq"),
        col("page.pageid").cast("string").as("page_key"), col("page"))
    val merged = Wikimedia.mergePages(df).collect().head
    val expect = Wikimedia.mergePages(Wikimedia.parsePages(
      Seq(fixture("continuation/page_44672212_merged.json")).toDF("json"),
      "json")).collect().head
    assert(merged == expect) // full Row equality, globalusage order included
    assert(merged.getSeq[Any](merged.fieldIndex("globalusage")).size == 16)
  }

  test("response-level continuation merge of wmc_pretty1+2+3 equals " +
      "wmc_pretty123 (_merge_response_jsons chain)") {
    val run = Seq(
      (0L, fixture("continuation/wmc_pretty1.json")),
      (1L, fixture("continuation/wmc_pretty2.json")),
      (2L, fixture("continuation/wmc_pretty3.json"))).toDF("seq", "json")
    val merged = Wikimedia.mergePages(
      Wikimedia.parseResponses(run, "seq", "json"))
      .orderBy("page_key").collect()
    val expect = Wikimedia.mergePages(Wikimedia.parseResponses(
      Seq((0L, fixture("continuation/wmc_pretty123.json"))).toDF("seq", "json"),
      "seq", "json")).orderBy("page_key").collect()
    assert(merged.length == expect.length && merged.length == 9)
    merged.zip(expect).foreach { case (m, e) => assert(m == e) }
  }

  test("cleanse_url: scheme-relative, scheme-less, and full URLs " +
      "(wikimedia_commons.py:355-368)") {
    val out = Seq(
      "//commons.wikimedia.org/wiki/User:PtrQs",
      "//other.example/x",
      "example.com/path",
      "https://done.example/y")
      .toDF("u").select(Wikimedia.cleanseUrl(col("u"))).as[String].collect()
    assert(out(0) == "https://commons.wikimedia.org/wiki/User:PtrQs")
    assert(out(1) == "http://other.example/x")
    assert(out(2) == "http://example.com/path")
    assert(out(3) == "https://done.example/y")
  }
}
