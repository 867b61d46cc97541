package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the NYPL extraction, pinned against
  * the reference's fixture JSON and the cases of test_nypl.py. */
class NyplSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/nypl"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  test("preferred image/thumbnail picked by t= code order with " +
      "download flag stripped (test_get_images_success / _failure)") {
    val doc =
      s"""{"nyplAPI":{"response":{"sibling_captures":{"capture":[
         |{"imageID":{"$$":"56738462"},
         |"imageLinks":{"imageLink":${fixture("images.json")}}}]}}}}"""
        .stripMargin
    val items = Nypl.parseItems(Seq(doc).toDF("json"), "json")
    val links = element_at(col("captures"), 1)
      .getField("imageLinks").getField("imageLink")
    val r = items.select(
      Nypl.preferredImage(links, Nypl.imageUrlDimensions).as("i"),
      Nypl.preferredImage(links, Nypl.thumbnailDimensions).as("t"))
      .collect().head
    assert(r.getString(0) ==
      "http://images.nypl.org/index.php?id=56738462&t=g&suffix=0cabe3d0-" +
        "3d50-0134-a8e0-00505686a51c.001")
    assert(r.getString(1) ==
      "http://images.nypl.org/index.php?id=56738462&t=w&suffix=0cabe3d0-" +
        "3d50-0134-a8e0-00505686a51c.001")
    // no links at all -> nulls
    val empty = Seq("""{"nyplAPI":{"response":{"sibling_captures":
      {"capture":[{"imageID":{"$":"x"}}]}}}}""").toDF("json")
    val e = Nypl.parseItems(empty, "json").select(
      Nypl.preferredImage(element_at(col("captures"), 1)
        .getField("imageLinks").getField("imageLink"),
        Nypl.imageUrlDimensions).as("i")).collect().head
    assert(e.getAs[String]("i") == null)
  }

  test("title from titleInfo[0]; empty list -> null " +
      "(test_get_title_success / _failure)") {
    val doc = s"""{"nyplAPI":{"response":{"mods":{
      "titleInfo":${fixture("title_info_success.json")}}}}}"""
    val t = Nypl.parseItems(Seq(doc).toDF("json"), "json")
      .select(Nypl.title(col("mods.titleInfo")).as("t"))
      .collect().head.getAs[String]("t")
    assert(t == "1900 census enumeration districts, Manhattan and Bronx")
    val none = Nypl.parseItems(Seq(
      """{"nyplAPI":{"response":{"mods":{"titleInfo":[]}}}}""")
      .toDF("json"), "json")
      .select(Nypl.title(col("mods.titleInfo")).as("t"))
      .collect().head.getAs[String]("t")
    assert(none == null)
  }

  test("creator is the first usage=primary name " +
      "(test_get_creators_success / _failure)") {
    val doc = s"""{"nyplAPI":{"response":{"mods":{
      "name":${fixture("creator_info_success.json")}}}}}"""
    val c = Nypl.parseItems(Seq(doc).toDF("json"), "json")
      .select(Nypl.creators(col("mods.name")).as("c"))
      .collect().head.getAs[String]("c")
    assert(c == "Hillman, Barbara")
  }

  test("metadata matches the golden metadata.json (test_get_metadata)") {
    val expectRow = spark.read.json(Seq(fixture("metadata.json")).toDS)
      .collect().head
    val expect = expectRow.schema.fieldNames
      .map(f => f -> expectRow.getAs[String](f)).toMap
    val actual = Nypl.parseItems(
      Seq(fixture("response_itemdetails_success.json")).toDF("json"), "json")
      .select(Nypl.metaData(col("mods")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(actual == expect)
  }

  test("golden end-to-end: the item details doc yields 7 capture rows " +
      "(test_handle_results_success / test_get_capture_detail_success)") {
    val out = Nypl.imageRows(Nypl.parseItems(
      Seq(fixture("response_itemdetails_success.json")).toDF("json"),
      "json"))
    val rows = out.collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[String]("image_url").contains("&t=g&"))
      assert(r.getAs[String]("license_url") != null)
      assert(!r.getAs[String]("image_url").contains("download=1"))
    }
  }

  test("a single-dict capture payload normalizes to one row " +
      "(nypl.py:123-125 type normalization)") {
    val doc =
      """{"nyplAPI":{"response":{"sibling_captures":{"capture":
        |{"imageID":{"$":"id1"},
        |"imageLinks":{"imageLink":[
        |  {"$":"http://images.nypl.org/index.php?id=1&t=g&suffix=s"}]},
        |"itemLink":{"$":"http://link"},
        |"rightsStatementURI":{"$":"http://rights"}}}}}}""".stripMargin
    val out = Nypl.imageRows(
      Nypl.parseItems(Seq(doc).toDF("json"), "json")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("foreign_identifier") == "id1")
  }
}
