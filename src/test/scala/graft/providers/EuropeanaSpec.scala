package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Europeana extraction, pinned
  * against the reference's fixture JSONs and test_europeana.py's
  * hard-coded expectations. */
class EuropeanaSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/europeana"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  test("golden sub-provider row from image_data_sub_provider_example.json " +
      "(test_process_image_data_with_sub_provider)") {
    val items = Europeana.parseItem(
      Seq(fixture("image_data_sub_provider_example.json")).toDF("json"), "json")
    val r = Europeana.imageRows(items).collect().head
    assert(r.getAs[String]("foreign_identifier") == "/9200579/zzwnbyhb")
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://wellcomecollection.org/works/zzwnbyhb")
    assert(r.getAs[String]("image_url") ==
      "https://iiif.wellcomecollection.org/image/V0013398.jpg/full/512," +
        "/0/default.jpg")
    assert(r.getAs[String]("license_url") ==
      "http://creativecommons.org/licenses/by/4.0/")
    assert(r.getAs[String]("title") ==
      "Royal Naval Hospital, Greenwich, with ships and rowing boats " +
        "in the foreground. Engraving.")
    assert(r.getAs[String]("description") == "Lettering: Greenwich Hospital.")
    assert(r.getSeq[String](r.fieldIndex("country")) == Seq("United Kingdom"))
    assert(r.getSeq[String](r.fieldIndex("data_provider")) ==
      Seq("Wellcome Collection"))
    assert(r.getAs[String]("source") == "wellcome_collection")
  }

  test("golden plain row from image_data_example.json: def-language " +
      "description fallback, provider source") {
    val items = Europeana.parseItem(
      Seq(fixture("image_data_example.json")).toDF("json"), "json")
    val r = Europeana.imageRows(items).collect().head
    // test_get_description_with_langaware_def expectation
    assert(r.getAs[String]("description") ==
      "Sello en seco: España artística y monumental.")
    assert(r.getAs[String]("source") == "europeana")
    assert(r.getAs[String]("license_url") != null)
  }

  test("description fallback order: en wins over def (test_get_description_" +
      "with_langaware_en); all-missing yields empty string") {
    val en = """{"id":"x","dcDescriptionLangAware":
      |{"en":["First English Description","Second English Description"],
      |"def":["other"]}}""".stripMargin
    val none = """{"id":"y"}"""
    val out = Europeana.imageRows(Europeana.parseItem(
      Seq(en, none).toDF("json"), "json"))
      .orderBy(asc("foreign_identifier"))
      .select("description").as[String].collect()
    assert(out(0) == "First English Description")
    assert(out(1) == "")
  }

  test("image list fixture explodes into one row per item with CC " +
      "licenses only") {
    val items = Europeana.parseItems(
      Seq(fixture("europeana_example.json")).toDF("json"), "json")
    val rows = Europeana.imageRows(items).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      assert(r.getAs[String]("image_url") != null)
      val lic = r.getAs[String]("license_url")
      assert(lic == null || lic.contains("creativecommons"))
    }
  }
}
