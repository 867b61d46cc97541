package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Walters Art Museum extraction,
  * pinned against the reference's fixture JSON and the cases of
  * test_walters_art_museum.py. */
class WaltersSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/waltersartmuseum"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  private def itemOf(json: String) =
    Seq(s"""{"ReturnStatus":true,"Items":[$json]}""").toDF("json")
      .transform(df => Walters.parseItems(df, "json"))

  test("ReturnStatus gate: false or missing drops the page " +
      "(test_extract_items_list_from_json_*)") {
    val ok = Walters.parseItems(
      Seq(fixture("walters_full_response_example.json")).toDF("json"),
      "json")
    assert(ok.count() > 0)
    val bad = Walters.parseItems(
      Seq(fixture("walters_full_response_example.json")
        .replace("\"ReturnStatus\":true", "\"ReturnStatus\":false"))
        .toDF("json"), "json")
    assert(bad.count() == 0)
  }

  test("creator info: browse url from lowercased creator; absent " +
      "creator nulls both (test_get_creator_info_*)") {
    val r = itemOf("""{"Creator":"Iranian"}""")
      .select(Walters.creatorInfo(col("i")).as("c"))
      .select(col("c.creator"), col("c.creator_url")).collect().head
    assert(r.getString(0) == "Iranian")
    assert(r.getString(1) == "https://art.thewalters.org/browse/iranian")
    val none = itemOf(fixture("no_creator_info.json"))
      .select(Walters.creatorInfo(col("i")).as("c"))
      .select(col("c.creator"), col("c.creator_url")).collect().head
    assert(none.getAs[String](0) == null && none.getAs[String](1) == null)
  }

  test("meta_data: full, partial, and empty cases " +
      "(test_get_image_meta_data_*)") {
    def metaOf(json: String) = itemOf(json)
      .select(Walters.metaData(col("i")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    val full = metaOf(fixture("full_image_object.json"))
    assert(full == Map(
      "ObjectNumber" -> "W.569.4A",
      "PublicAccessDate" -> "2014-04-25T13:19:25.22",
      "Collection" -> "Manuscripts",
      "Medium" ->
        "ink and pigments on thick cream-colored, gold-flecked paper",
      "Classification" -> "Manuscripts & Rare Books",
      "Description" -> "abc",
      "CreditLine" -> "Acquired by Henry Walters"))
    val partial = metaOf(fixture("partial_meta_data.json"))
    assert(partial.nonEmpty && partial.size < 7)
    assert(metaOf(fixture("no_meta_data.json")).isEmpty)
  }

  test("golden end-to-end row from full_image_object.json " +
      "(test_process_image_returns_expected_output_given_right_input)") {
    val out = Walters.imageRows(itemOf(fixture("full_image_object.json")))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("foreign_landing_url") ==
      "http://art.thewalters.org/detail/2")
    assert(r.getAs[String]("image_url") ==
      "http://static.thewalters.org/images/CPS_W.569.4a_Fp_DD.jpg")
    assert(r.getAs[String]("thumbnail_url") ==
      "http://static.thewalters.org/images/CPS_W.569.4a_Fp_DD.jpg?width=100")
    assert(r.getAs[String]("license_url") ==
      "https://creativecommons.org/publicdomain/zero/1.0/")
    assert(r.getAs[String]("foreign_identifier") == "W.569.4A")
    assert(r.getAs[String]("creator") == "Iranian")
    assert(r.getAs[String]("creator_url") ==
      "https://art.thewalters.org/browse/iranian")
    assert(r.getAs[String]("title") == "Leaf from Qur'an")
  }
}
