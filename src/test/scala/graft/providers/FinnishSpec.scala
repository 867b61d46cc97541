package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Finnish Museums extraction,
  * pinned against the reference's fixture JSON and the cases of
  * test_finnish_museums.py. */
class FinnishSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/finnishmuseums"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  private def recordOf(json: String) =
    Seq(s"""{"status":"OK","records":[$json]}""").toDF("json")
      .transform(df => Finnish.parseRecords(df, "json"))

  test("status gate: non-ok responses drop all records " +
      "(test_get_object_list_from_json_*)") {
    val ok = Finnish.parseRecords(
      Seq(fixture("finna_full_response_example.json")).toDF("json"), "json")
    assert(ok.count() > 0)
    val bad = Seq("""{"status":"ERROR","records":[{"id":"x"}]}""")
      .toDF("json").transform(df => Finnish.parseRecords(df, "json"))
    assert(bad.count() == 0)
  }

  test("raw tags flatten the nested subject lists (test_get_raw_tags)") {
    val tags = recordOf(fixture("object_complete_example.json"))
      .select(Finnish.rawTags(col("rec.subjects")).as("t"))
      .collect().head.getSeq[String](0)
    assert(tags == Seq("koivu", "linnunpöntöt", "Revonristi",
      "valmistusaika: 11.06.1923"))
  }

  test("golden end-to-end row mirrors test_process_object_with_real_example") {
    val out = Finnish.imageRows(
      recordOf(fixture("object_complete_example.json"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("license_url") ==
      "http://creativecommons.org/licenses/by/4.0/deed.fi")
    assert(r.getAs[String]("foreign_identifier") ==
      "museovirasto.CC0641BB5337F541CBD19169838BAC1F")
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://www.finna.fi/Record/" +
        "museovirasto.CC0641BB5337F541CBD19169838BAC1F")
    assert(r.getAs[String]("image_url") ==
      "https://api.finna.fi/Cover/Show?id=" +
        "museovirasto.CC0641BB5337F541CBD19169838BAC1F&index=0&size=large")
    assert(r.getAs[String]("title") == "linnunpönttö koivussa")
    assert(r.getAs[String]("source") == "finnish_heritage_agency")
    assert(r.getSeq[String](r.fieldIndex("tags")) == Seq(
      "koivu", "linnunpöntöt", "Revonristi", "valmistusaika: 11.06.1923"))
  }

  test("unknown building falls back to the default provider source") {
    val rec = """{"id":"x.1","title":"t",
      "buildings":[{"value":"0/Unknown Museum/"}],
      "imageRights":{"link":"http://creativecommons.org/licenses/by/4.0/"},
      "images":["/Cover/Show?id=x.1"]}"""
    val out = Finnish.imageRows(recordOf(rec)).collect().head
    assert(out.getAs[String]("source") == "finnish_museums")
  }
}
