package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Met extraction, pinned against
  * the reference's fixture JSON and the cases of
  * test_metropolitan_museum_of_art.py. */
class MetSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/metropolitan_museum_of_art"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  test("meta_data maps the six renamed keys (test_create_meta_data)") {
    val json =
      """{"accessionNumber":"36.100.45","classification":"Paintings",
        |"creditLine":"The Howard Mansfield Collection, Purchase, Rogers Fund, 1936",
        |"culture":"Japan","objectDate":"late 17th century",
        |"medium":"Hanging scroll; ink and color on silk"}""".stripMargin
    val m = Met.parseObjects(Seq(json).toDF("json"), "json")
      .select(Met.metaData(col("o")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(m == Map(
      "accession_number" -> "36.100.45",
      "classification" -> "Paintings",
      "credit_line" ->
        "The Howard Mansfield Collection, Purchase, Rogers Fund, 1936",
      "culture" -> "Japan",
      "date" -> "late 17th century",
      "medium" -> "Hanging scroll; ink and color on silk"))
  }

  test("golden row without additional images " +
      "(test_get_data_for_image_returns_response_json_when_all_ok)") {
    val out = Met.imageRows(Met.parseObjects(
      Seq(fixture("sample_response_without_additional.json"))
        .toDF("json"), "json")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("creator") == "")
    assert(r.getAs[String]("foreign_identifier") == "45733-79_2_414b_S1_sf"
      .replace("45733", "47533")) // fixture's objectID is 47533
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://www.metmuseum.org/art/collection/search/47533")
    assert(r.getAs[String]("image_url") ==
      "https://images.metmuseum.org/CRDImages/as/original/79_2_414b_S1_sf.jpg")
    assert(r.getAs[String]("thumbnail_url") ==
      "https://images.metmuseum.org/CRDImages/as/web-large/79_2_414b_S1_sf.jpg")
    assert(r.getAs[String]("license") == "cc0")
    assert(r.getAs[String]("title") == "Cover")
    assert(r.getMap[String, String](r.fieldIndex("meta_data")).toMap == Map(
      "accession_number" -> "79.2.414b",
      "classification" -> "Ceramics",
      "culture" -> "China",
      "date" -> "",
      "medium" -> "Porcelain painted in underglaze blue",
      "credit_line" -> "Purchase by subscription, 1879"))
  }

  test("golden rows with additional images: primary keeps thumbnail, " +
      "additional don't (test_..._with_additional_images)") {
    val out = Met.imageRows(Met.parseObjects(
      Seq(fixture("sample_response.json")).toDF("json"), "json"))
      .collect()
    assert(out.length == 3)
    val last = out.last
    assert(last.getAs[String]("creator") == "Kiyohara Yukinobu")
    assert(last.getAs[String]("foreign_identifier") == "45734-DP251120")
    assert(last.getAs[String]("image_url") ==
      "https://images.metmuseum.org/CRDImages/as/original/DP251120.jpg")
    assert(last.getAs[String]("thumbnail_url") == null)
    assert(last.getAs[String]("title") == "Quail and Millet")
    assert(last.getMap[String, String](last.fieldIndex("meta_data")).toMap ==
      Map(
        "accession_number" -> "36.100.45",
        "classification" -> "Paintings",
        "culture" -> "Japan",
        "date" -> "late 17th century",
        "medium" -> "Hanging scroll; ink and color on silk",
        "credit_line" ->
          "The Howard Mansfield Collection, Purchase, Rogers Fund, 1936"))
    // the primary-image row carries the small rendition
    assert(out.head.getAs[String]("thumbnail_url") != null)
  }

  test("non-public-domain objects are dropped " +
      "(_get_and_validate_object_json)") {
    val flipped = fixture("sample_response_without_additional.json")
      .replace("\"isPublicDomain\": true", "\"isPublicDomain\": false")
    assert(Met.imageRows(Met.parseObjects(
      Seq(flipped).toDF("json"), "json")).count() == 0)
  }
}
