package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Museums Victoria extraction,
  * pinned against the reference's fixture JSON and the cases of
  * test_museum_victoria.py. */
class MuseumVictoriaSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/museumvictoria"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  private def mediaOf(mediaJson: String) =
    Seq(s"""[{"id":"x","media":[$mediaJson]}]""").toDF("json")
      .transform(df => MuseumVictoria.parseObjects(df, "json"))
      .select(element_at(col("obj.media"), 1).as("m"))

  test("image rendition by key presence: large > medium > small " +
      "(test_get_image_data_large / _medium / _small / _none)") {
    def pickJson(json: String): (String, Integer, Integer) = {
      val r = mediaOf(json)
        .select(MuseumVictoria.imageData(col("m")).as("i"))
        .select(col("i.url"), col("i.height"), col("i.width"))
        .collect().head
      (r.getAs[String](0), r.getAs[Integer](1), r.getAs[Integer](2))
    }
    def pick(name: String): (String, Integer, Integer) = pickJson(fixture(name))
    assert(pick("large_image_data.json") ==
      (("https://collections.museumsvictoria.com.au/content/media/45/" +
        "329745-large.jpg", 2581, 2785)))
    assert(pick("medium_image_data.json") ==
      (("https://collections.museumsvictoria.com.au/content/media/45/" +
        "329745-medium.jpg", 1390, 1500)))
    assert(pick("small_image_data.json") ==
      (("https://collections.museumsvictoria.com.au/content/media/45/" +
        "329745-small.jpg", 500, 540)))
    assert(pickJson("""{"type":"image","id":"none"}""") ==
      ((null, null, null)))
  }

  test("license url: creativecommons uri passes, others null " +
      "(test_get_license_url / _failure)") {
    val ok = mediaOf(fixture("cc_image_data.json"))
      .select(MuseumVictoria.licenseUrl(col("m")).as("l"))
      .collect().head.getAs[String]("l")
    assert(ok == "https://creativecommons.org/licenses/by/4.0")
  }

  test("creator joins media creators (test_get_creator)") {
    val c = mediaOf(fixture("cc_image_data.json"))
      .select(MuseumVictoria.creator(col("m")).as("c"))
      .collect().head.getAs[String]("c")
    assert(c == "Photographer: Deb Tout-Smith")
  }

  test("metadata matches golden metadata.json (test_get_metadata)") {
    val expectRow = spark.read.json(Seq(fixture("metadata.json")).toDS)
      .collect().head
    val expect = expectRow.schema.fieldNames
      .map(f => f -> expectRow.getAs[String](f)).toMap
    val actual = MuseumVictoria.parseObjects(
      Seq(fixture("batch_objects.json")).toDF("json"), "json").limit(1)
      .select(MuseumVictoria.metaData(col("obj")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(actual == expect)
  }

  test("golden end-to-end: batch_objects.json yields 1 row " +
      "(test_handle_batch_objects_success); non-cc media dropped " +
      "(test_get_media_info_failure)") {
    val out = MuseumVictoria.imageRows(MuseumVictoria.parseObjects(
      Seq(fixture("batch_objects.json")).toDF("json"), "json")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("foreign_landing_url")
      .startsWith("https://collections.museumsvictoria.com.au/"))
    assert(r.getAs[String]("license_url").contains("creativecommons"))

    val bad = MuseumVictoria.imageRows(
      Seq(s"""[{"id":"o1","media":${fixture("media_data_failure.json")}}]""")
        .toDF("json")
        .transform(df => MuseumVictoria.parseObjects(df, "json")))
    assert(bad.count() == 0)
  }
}
