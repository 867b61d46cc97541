package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Flickr extraction, pinned
  * against the reference's fixture JSON and the cases of
  * test_flickr.py. */
class FlickrSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/flickr"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  /** Parse one bare photo dict (the image_data_*.json fixtures) into
    * the `p` struct imageRows consumes. */
  private def photoDf(json: String) =
    Seq(json).toDF("json")
      .select(from_json(col("json"), Flickr.photoSchema).as("p"))

  private def extractOne(json: String): Row =
    Flickr.imageRows(photoDf(json)).collect().head

  test("parsePhotos explodes a realistic response page " +
      "(test_extract_image_list_from_json_handles_realistic_input)") {
    val rows = Flickr.parsePhotos(
      Seq(fixture("flickr_example_pretty.json")).toDF("json"), "json")
    assert(rows.count() == 30)
  }

  test("parsePhotos drops non-ok responses " +
      "(test_extract_image_list_from_json_returns_nones_given_non_ok_stat)") {
    val rows = Flickr.parsePhotos(
      Seq("""{"stat":"fail","photos":{"photo":[{"id":"1"}]}}""")
        .toDF("json"), "json")
    assert(rows.count() == 0)
  }

  test("image URL pick prefers large, then medium, then small " +
      "(test_get_image_url_*)") {
    def pick(name: String): (String, Integer, Integer) = {
      val r = photoDf(fixture(name))
        .select(Flickr.imagePick(col("p")).as("x"))
        .select(col("x.url"), col("x.height"), col("x.width"))
        .collect().head
      (r.getAs[String](0), r.getAs[Integer](1), r.getAs[Integer](2))
    }
    assert(pick("image_data_with_large_url_available.json") ==
      (("https://live.staticflickr.com/456_b.jpg", 768, 1024)))
    assert(pick("image_data_with_med_url_available.json") ==
      (("https://live.staticflickr.com/456.jpg", 375, 500)))
    assert(pick("image_data_with_small_url_available.json") ==
      (("https://live.staticflickr.com/456_m.jpg", 180, 240)))
    assert(pick("image_data_no_image_url.json") == ((null, null, null)))
  }

  test("license lookup: int or string id, unknown id nulls " +
      "(test_get_license_*)") {
    val small = Map("1" -> ("by-nc-sa", "2.0"), "2" -> ("by-nc", "2.0"))
    val out = Seq(2, 12).toDF("lid")
      .select(Flickr.license(col("lid"), small).as("l"))
      .select(col("l.license"), col("l.version")).collect()
    assert(out(0).getString(0) == "by-nc" && out(0).getString(1) == "2.0")
    assert(out(1) == Row(null, null))
    val s = Seq("2").toDF("lid")
      .select(Flickr.license(col("lid"), small).getField("license"))
      .as[String].collect().head
    assert(s == "by-nc")
  }

  test("url join strips slashes like _url_join (test_url_join_*)") {
    val joined = spark.range(1).select(Flickr.urlJoin(
      lit("https://aurl.com/"), lit("/path/"), lit("/morepath/"),
      lit("lastpath")).as("u")).as[String].collect().head
    assert(joined == "https://aurl.com/path/morepath/lastpath")
  }

  test("creator/foreign-landing URLs; falsy parts null out " +
      "(test_build_creator_url_*, test_build_foreign_landing_url_*)") {
    val df = Seq(
      ("456@N04", "49514824541"), // both present
      (null, "49514824541"),      // no owner -> no creator_url
      ("456@N04", ""))            // falsy foreign id
      .toDF("owner", "fid")
    val cu = Flickr.creatorUrl(col("owner"))
    val out = df.select(cu.as("cu"),
      Flickr.foreignLandingUrl(cu, col("fid")).as("flu")).collect()
    assert(out(0) == Row("https://www.flickr.com/photos/456@N04",
      "https://www.flickr.com/photos/456@N04/49514824541"))
    assert(out(1) == Row(null, null))
    assert(out(2).getString(0) != null && out(2).getString(1) == null)
  }

  test("meta_data strips HTML from the description like lxml //text() " +
      "(test_create_meta_data_dict_strips_html)") {
    val expect = spark.read.json(
      Seq(fixture("expect_meta_data_from_html_description.json")).toDS)
      .collect().head
    val m = photoDf(fixture("image_data_html_description.json"))
      .select(Flickr.metaData(col("p")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(m("description") == expect.getAs[String]("description"))
    assert(m("pub_date") == expect.getAs[String]("pub_date"))
    assert(m("date_taken") == expect.getAs[String]("date_taken"))
    assert(m("views") == expect.getAs[String]("views"))
  }

  test("whitespace-only description yields no description key " +
      "(test_create_meta_data_handles_whitespace_description)") {
    val m = photoDf(fixture("image_data_whitespace_description.json"))
      .select(Flickr.metaData(col("p")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(m == Map("pub_date" -> "1571326372",
      "date_taken" -> "2019-09-07 16:26:44", "views" -> "9"))
  }

  test("partial / empty photo dicts fill only present meta keys " +
      "(test_create_meta_data_fills_partial / _makes_empty)") {
    val partial = photoDf(fixture("image_data_partial_meta_data_info.json"))
      .select(Flickr.metaData(col("p")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(partial == Map("pub_date" -> "1571326372",
      "date_taken" -> "2019-09-07 16:26:44"))
    val empty = photoDf(fixture("image_data_no_meta_data_info.json"))
      .select(Flickr.metaData(col("p")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(empty == Map.empty[String, String])
  }

  test("tags: whitespace split + distinct + sorted; string-length cap; " +
      "empty/missing -> null (test_create_tags_list_*)") {
    def tags(json: String, maxLen: Int = Flickr.maxTagStringLength) =
      Option(photoDf(json)
        .select(Flickr.tagsList(col("p").getField("tags"), maxLen).as("t"))
        .collect().head.getSeq[String](0)).map(_.toList)
    assert(tags(fixture("image_data_varying_tags_whitespace.json"))
      .contains(List("tag1", "tag2", "tag3")))
    assert(tags(fixture("image_data_unsorted_tags.json"))
      .contains(List("tag1", "tag2", "tag3")))
    // cap applies to the STRING, cutting tag7 off entirely
    assert(tags(fixture("image_data_long_tags_string.json"), maxLen = 37)
      .contains(List("tag1", "tag2", "tag3", "tag4", "tag5", "tag6")))
    assert(tags("""{"id":"aslkjb"}""").isEmpty)
    assert(tags("""{"id":"aslkjb","tags":""}""").isEmpty)
  }

  test("golden end-to-end row from image_data_complete_example.json " +
      "(test_process_image_data_with_real_example)") {
    val r = extractOne(fixture("image_data_complete_example.json"))
    assert(r.getAs[String]("foreign_identifier") == "49514824541")
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://www.flickr.com/photos/71925535@N03/49514824541")
    assert(r.getAs[String]("image_url") ==
      "https://live.staticflickr.com/65535/49514824541_35d1b4f8db_b.jpg")
    assert(r.getAs[String]("thumbnail_url") ==
      "https://live.staticflickr.com/65535/49514824541_35d1b4f8db_m.jpg")
    assert(r.getAs[String]("license") == "by-nc-sa")
    assert(r.getAs[String]("license_version") == "2.0")
    assert(r.getAs[Int]("width") == 1024)
    assert(r.getAs[Int]("height") == 683)
    assert(r.getAs[String]("creator") == "Marine Explorer")
    assert(r.getAs[String]("creator_url") ==
      "https://www.flickr.com/photos/71925535@N03")
    assert(r.getAs[String]("title") ==
      "Surveying Ruperts Reef @reeflifesurvey #lapofaus #marineexplorer")
    assert(r.getMap[String, String](r.fieldIndex("meta_data")).toMap == Map(
      "pub_date" -> "1581318235",
      "date_taken" -> "2020-02-10 09:38:16",
      "views" -> "70",
      "description" -> ("We had spectacular underwater scenery with great " +
        "visibility today despite the big seas and winds at Lord Howe " +
        "Island.")))
    assert(r.getSeq[String](r.fieldIndex("tags")) == Seq(
      "australia", "marine", "marineexplorer", "nature", "scuba",
      "underwater"))
    assert(r.getAs[String]("source") == "flickr")
  }

  test("golden sub-provider row: NASA HQ NSID maps source to 'nasa' " +
      "(test_process_image_data_with_sub_provider)") {
    val r = extractOne(fixture("image_data_sub_provider_example.json"))
    assert(r.getAs[String]("foreign_identifier") == "49950595947")
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://www.flickr.com/photos/35067687@N04/49950595947")
    assert(r.getAs[String]("image_url") ==
      "https://live.staticflickr.com/65535/49950595947_65a3560ddc_b.jpg")
    assert(r.getAs[String]("license") == "by-nc-sa")
    assert(r.getAs[Int]("width") == 1024)
    assert(r.getAs[Int]("height") == 683)
    assert(r.getAs[String]("creator") == "NASA HQ PHOTO")
    assert(r.getMap[String, String](r.fieldIndex("meta_data")).toMap == Map(
      "pub_date" -> "1590799192",
      "date_taken" -> "2020-05-29 13:50:27",
      "views" -> "28597",
      "description" -> ("A gopher tortoise is seen making its way towards " +
        "its burrow near Launch Complex 39A as preparations continue for " +
        "NASA SpaceX Demo-2 mission")))
    assert(r.getAs[String]("source") == "nasa")
  }
}
