package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Rawpixel extraction, pinned
  * against the reference's fixture JSON and the cases of
  * test_raw_pixel.py. */
class RawpixelSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/rawpixel"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  private def firstResult(name: String) =
    Rawpixel.parseResults(Seq(fixture(name)).toDF("json"), "json").limit(1)

  test("image properties parse w/h from the opengraph query " +
      "(test_get_image_properties)") {
    val r = firstResult("total_images_example.json")
      .select(Rawpixel.imageProperties(col("r")).as("p"))
      .select(col("p.url"), col("p.width"), col("p.height"), col("p.thumb"))
      .collect().head
    assert(r.getString(0).contains("pdmaps-loc-06-nam_1.jpg?w=1200&h=630"))
    assert(r.getString(1) == "1200")
    assert(r.getString(2) == "630")
    assert(r.getString(3).contains("?w=400&dpr=1"))
  }

  test("title/owner: '(Source)' suffix stripped " +
      "(test_get_title_owner)") {
    val r = firstResult("total_images_example.json")
      .select(Rawpixel.titleOwner(col("r")).as("t"))
      .select(col("t.title"), col("t.owner")).collect().head
    assert(r.getString(0) == "World map drawn on an oval projection")
    assert(r.getString(1) == "Library of Congress")
  }

  test("meta_data carries only a present pinterest description " +
      "(test_get_meta_data_given_* cases)") {
    val m = Rawpixel.imageRows(firstResult("total_images_example.json"))
      .select(col("meta_data")).collect().head.getMap[String, String](0).toMap
    assert(m.keySet == Set("description"))
    assert(m("description").startsWith("Portolan atlas of the Mediterranean"))
    assert(m("description").endsWith("Library of Congress (Source)"))
    val none = Rawpixel.imageRows(
      firstResult("total_images_but_pinterest_descr_example.json"))
      .select(col("meta_data")).collect().head.getMap[String, String](0).toMap
    assert(none.isEmpty)
  }

  test("tags drop the cc0 boilerplate keywords (test_get_tags)") {
    val tags = firstResult("total_images_example.json")
      .select(Rawpixel.tags(col("r").getField("keywords_raw")).as("t"))
      .collect().head.getSeq[String](0)
    assert(tags.length == 47)
    assert(tags.head == "america")
    assert(!tags.contains("cc0") && !tags.contains("creative commons"))
  }

  test("golden end-to-end row (test_process_image_data / " +
      "test_get_foreign_id_url)") {
    val out = Rawpixel.imageRows(
      Rawpixel.parseResults(
        Seq(fixture("total_images_example.json")).toDF("json"), "json"))
      .collect()
    assert(out.nonEmpty)
    val r = out.head
    assert(r.getAs[String]("foreign_identifier") == "2041320")
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://www.rawpixel.com/image/2041320/" +
        "world-map-drawn-oval-projection")
    assert(r.getAs[String]("license") == "cc0")
    assert(r.getAs[String]("width") == "1200")
    assert(r.getAs[String]("height") == "630")
    assert(r.getAs[String]("creator") == "Library of Congress")
  }
}
