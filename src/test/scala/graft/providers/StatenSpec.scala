package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Statens Museum extraction,
  * pinned against the reference's fixture JSON and the cases of
  * test_staten_museum.py. */
class StatenSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/statenmuseum"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  private def itemOf(json: String) =
    Seq(s"""{"items":[$json]}""").toDF("json")
      .transform(df => Staten.parseItems(df, "json"))

  test("images: main + alternatives with IIIF renditions " +
      "(test_get_image_complete / _partial / _none)") {
    val complete = itemOf(fixture("image_data_complete.json"))
      .select(explode(Staten.images(col("item"))).as("img"))
      .select(col("img.iiif_id"), col("img.image_url"),
        col("img.thumbnail"), col("img.height"), col("img.width"))
      .collect()
    assert(complete.length == 2)
    assert(complete(0).getString(0) ==
      "https://iip.smk.dk/iiif/jp2/KKSgb6458.tif.reconstructed.tif.jp2")
    assert(complete(0).getString(1) ==
      "https://iip.smk.dk/iiif/jp2/KKSgb6458.tif.reconstructed.tif.jp2" +
        "/full/max/0/default.jpg")
    assert(complete(0).getString(2) ==
      "https://iip.smk.dk/iiif/jp2/KKSgb6458.tif.reconstructed.tif.jp2" +
        "/full/!400,/0/default.jpg")
    assert(complete(0).getInt(3) == 1059 && complete(0).getInt(4) == 3887)
    assert(complete(1).getString(0) ==
      "https://iip.smk.dk/iiif/jp2/KKSgb6458.tif.jp2")
    assert(complete(1).getInt(3) == 1576 && complete(1).getInt(4) == 4073)

    val partial = itemOf(fixture("image_data_partial.json"))
      .select(explode(Staten.images(col("item"))).as("img"))
      .collect()
    assert(partial.length == 1)

    val none = itemOf("""{"object_number":"x"}""")
      .select(size(Staten.images(col("item"))).as("n"))
      .collect().head.getInt(0)
    assert(none == 0)
  }

  test("license: creativecommons rights string -> cc0 1.0 " +
      "(test_get_license_info_success / _failure)") {
    val out = Seq(
      "https://creativecommons.org/share-your-work/public-domain/cc0/",
      "all rights reserved", null)
      .toDF("r").select(Staten.isCcRights(col("r")).as("ok"))
      .collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, false, false))
  }

  test("metadata: unconditional created_date, comma-joined lists " +
      "(test_get_metadata)") {
    val m = itemOf(fixture("item.json"))
      .select(Staten.metaData(col("item")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(m == Map(
      "created_date" -> "2020-03-21T10:18:17Z",
      "collection" -> "Gammel bestand",
      "techniques" -> "Kobberstik"))
  }

  test("golden end-to-end: items_batch.json yields 1 row " +
      "(test_handle_items_data_success)") {
    val out = Staten.imageRows(
      Seq(s"""{"items":${fixture("items_batch.json")}}""").toDF("json")
        .transform(df => Staten.parseItems(df, "json"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("license") == "cc0")
    assert(r.getAs[String]("foreign_landing_url")
      .startsWith("https://open.smk.dk/en/artwork/image/"))
    assert(r.getAs[String]("image_url").endsWith("/full/max/0/default.jpg"))
  }
}
