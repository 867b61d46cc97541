package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Cleveland Museum extraction,
  * pinned against the reference's fixture JSON and the cases of
  * test_cleveland_museum_of_art.py. */
class ClevelandSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/clevelandmuseum"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  private def pickOf(imagesJson: String): (String, String) = {
    val r = Seq(s"""{"images":$imagesJson}""").toDF("json")
      .select(from_json(col("json"), Cleveland.itemSchema).as("d"))
      .select(Cleveland.imagePick(col("d.images")).as("p"))
      .select(col("p.url"), col("p.key"))
      .collect().head
    (r.getAs[String](0), r.getAs[String](1))
  }

  test("image pick prefers web, then print, then full " +
      "(test_get_image_type_web/_print/_full)") {
    assert(pickOf(fixture("image_type_web.json")) ==
      (("https://openaccess-cdn.clevelandart.org/1335.1917/" +
        "1335.1917_web.jpg", "web")))
    assert(pickOf(fixture("image_type_print.json"))._2 == "print")
    assert(pickOf(fixture("image_type_full.json"))._2 == "full")
  }

  test("all-empty rendition dicts are falsy like python dicts " +
      "(test_get_image_type_none)") {
    assert(pickOf(fixture("image_type_none.json")) == ((null, null)))
  }

  test("metadata carries the fixed 7 keys with '' defaults and " +
      "comma-joined culture (test_get_metadata)") {
    val expectRow = spark.read
      .json(Seq(fixture("expect_metadata.json")).toDS).collect().head
    val expect = expectRow.schema.fieldNames
      .map(f => f -> expectRow.getAs[String](f)).toMap
    val actual = Seq(fixture("complete_data.json")).toDF("json")
      .select(from_json(col("json"), Cleveland.itemSchema).as("d"))
      .select(Cleveland.metaData(col("d")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(actual == expect)
  }

  test("golden end-to-end row from complete_data.json; non-CC0 rows " +
      "are dropped (test_handle_response)") {
    val item = Seq(fixture("complete_data.json")).toDF("json")
      .select(from_json(col("json"), Cleveland.itemSchema).as("d"))
    val out = Cleveland.imageRows(item).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("foreign_identifier") == 93014L)
    assert(r.getAs[String]("license") == "cc0")
    assert(r.getAs[String]("license_version") == "1.0")
    assert(r.getAs[String]("title") ==
      "View of Schroon Mountain, Essex County, New York, After a Storm")
    assert(r.getAs[String]("creator") == "Thomas Cole (American, 1801-1848)")
    assert(r.getAs[String]("image_url") != null)
    val m = r.getMap[String, String](r.fieldIndex("meta_data")).toMap
    assert(m("technique") == "oil on canvas")
    assert(m("culture") == "America, 19th century")

    // flipping the license drops the row (\"Wrong license image\")
    val bad = Seq(fixture("complete_data.json")
      .replace("\"CC0\"", "\"by\"")).toDF("json")
      .select(from_json(col("json"), Cleveland.itemSchema).as("d"))
    assert(Cleveland.imageRows(bad).count() == 0)
  }

  test("handle_response_data.json batch: every CC0 row extracted " +
      "(test_handle_response)") {
    val rows = Cleveland.parseItems(
      Seq(fixture("handle_response_data.json")).toDF("json"), "json")
    val out = Cleveland.imageRows(rows)
    assert(out.count() > 0)
    // the whole batch in the fixture is CC0
    assert(out.count() == rows.count())
  }
}
