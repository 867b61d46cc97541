package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Science Museum extraction,
  * pinned against the reference's fixture JSON and the cases of
  * test_science_museum.py. */
class ScienceMuseumSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/sciencemuseum"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  /** Wrap a bare attributes/processed/source fixture into a one-row
    * object frame. */
  private def objDf(objJson: String) =
    Seq(s"""{"data":[$objJson]}""").toDF("json")
      .transform(df => ScienceMuseum.parseObjects(df, "json"))

  test("creator comes from the first maker of the first creation " +
      "(test_creator_info_success / _fail)") {
    val attr = fixture("object_attr.json")
    val c = objDf(s"""{"id":"x","attributes":$attr}""")
      .select(ScienceMuseum.creator(col("obj.attributes")).as("c"))
      .collect().head.getAs[String]("c")
    assert(c == "W D and H O Wills Limited")
    val none = objDf("""{"id":"x","attributes":{"summary_title":"t"}}""")
      .select(ScienceMuseum.creator(col("obj.attributes")).as("c"))
      .collect().head.getAs[String]("c")
    assert(none == null)
  }

  test("image info picks large then medium, completing relative URLs " +
      "(test_image_info_large / _medium / _failure)") {
    def info(processed: String): (String, Integer, Integer) = {
      val r = objDf(s"""{"id":"x","attributes":{"multimedia":[
        {"admin":{"uid":"u"},"processed":$processed}]}}""")
        .select(ScienceMuseum.imageInfo(
          element_at(col("obj.attributes.multimedia"), 1)
            .getField("processed")).as("i"))
        .select(col("i.url"), col("i.height"), col("i.width"))
        .collect().head
      (r.getAs[String](0), r.getAs[Integer](1), r.getAs[Integer](2))
    }
    assert(info(fixture("large_image.json")) ==
      (("https://coimages.sciencemuseumgroup.org.uk/images/3/563/" +
        "large_1999_0299_0001__0002_.jpg", 1022, 1536)))
    assert(info(fixture("medium_image.json")) ==
      (("https://coimages.sciencemuseumgroup.org.uk/images/3/563/" +
        "medium_1999_0299_0001__0002_.jpg", 576, 866)))
    assert(info("{}") == ((null, null, null)))
  }

  test("thumbnail prefers large > medium > small " +
      "(test_thumbnail_large / _medium / _small / _failure)") {
    def thumbOf(processed: String): String =
      objDf(s"""{"id":"x","attributes":{"multimedia":[
        {"admin":{"uid":"u"},"processed":$processed}]}}""")
        .select(ScienceMuseum.thumbnailUrl(
          element_at(col("obj.attributes.multimedia"), 1)
            .getField("processed")).as("t"))
        .collect().head.getAs[String]("t")
    assert(thumbOf(fixture("thumbnail_large.json")).contains("large"))
    assert(thumbOf(fixture("thumbnail_medium.json")).contains("medium"))
    assert(thumbOf(fixture("thumbnail_small.json")).contains("small"))
    assert(thumbOf("{}") == null)
  }

  test("check_url completes relative locations and passes absolutes " +
      "(test_check_relative_url / _complete_url / _none)") {
    val out = Seq("3/563/a.jpg", "https://x.org/a.jpg", null)
      .toDF("u").select(ScienceMuseum.checkUrl(col("u")).as("c"))
      .as[String].collect()
    assert(out(0) ==
      "https://coimages.sciencemuseumgroup.org.uk/images/3/563/a.jpg")
    assert(out(1) == "https://x.org/a.jpg")
    assert(out(2) == null)
  }

  test("license version plucks rights[0].usage_terms; missing shapes " +
      "null out (test_get_license*)") {
    def lv(source: String): String =
      objDf(s"""{"id":"x","attributes":{"multimedia":[
        {"admin":{"uid":"u"},"source":$source}]}}""")
        .select(ScienceMuseum.licenseVersion(
          element_at(col("obj.attributes.multimedia"), 1)
            .getField("source")).as("l"))
        .collect().head.getAs[String]("l")
    assert(lv(fixture("license_source.json")) == "CC-BY-NC-SA 4.0")
    assert(lv("{}") == null)
    assert(lv(fixture("no_license.json")) == null)
  }

  test("metadata matches the golden metadata.json (test_get_metadata)") {
    val expectRow = spark.read.json(Seq(fixture("metadata.json")).toDS)
      .collect().head
    val expect = expectRow.schema.fieldNames
      .map(f => f -> expectRow.getAs[String](f)).toMap
    val actual = objDf(
      s"""{"id":"x","attributes":${fixture("object_attr.json")}}""")
      .select(ScienceMuseum.metaData(col("obj.attributes")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(actual == expect)
  }

  test("golden end-to-end: objects_data.json yields 2 image rows with " +
      "parsed cc license (test_handle_obj_data)") {
    val rows = ScienceMuseum.imageRows(
      Seq(s"""{"data":${fixture("objects_data.json")}}""").toDF("json")
        .transform(df => ScienceMuseum.parseObjects(df, "json")))
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[String]("license") == "by-nc-sa")
      assert(r.getAs[String]("license_version") == "4.0")
      assert(r.getAs[String]("foreign_identifier") != null)
      assert(r.getAs[String]("image_url")
        .startsWith("https://coimages.sciencemuseumgroup.org.uk/images/"))
    }
  }
}
