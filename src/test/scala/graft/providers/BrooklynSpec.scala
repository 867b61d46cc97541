package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Brooklyn Museum extraction,
  * pinned against the reference's fixture JSON and the cases of
  * test_brooklyn_museum.py. */
class BrooklynSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/brooklynmuseum"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  private def licenseOf(rightsJson: String): String =
    Seq(s"""{"rights_type":$rightsJson}""").toDF("json")
      .transform(df => Brooklyn.parseObjects(df, "json"))
      .select(Brooklyn.licenseUrl(col("o.rights_type")).as("l"))
      .collect().head.getAs[String]("l")

  test("license url: the single creativecommons link in the rights " +
      "description (test_get_cc/public/no_license_url)") {
    assert(licenseOf(fixture("cc_license_info.json")) ==
      "https://creativecommons.org/licenses/by/3.0/")
    assert(licenseOf(fixture("public_license_info.json")) ==
      "https://creativecommons.org/publicdomain/zero/1.0/")
    assert(licenseOf(fixture("no_license_info.json")) == null)
  }

  test("image sizes come from the largest_derivative match; a non-list " +
      "derivatives payload nulls out (test_get_image_size / _no_size)") {
    def sizesOf(imageJson: String): (Integer, Integer) = {
      val r = Seq(s"""{"images":[$imageJson]}""").toDF("json")
        .transform(df => Brooklyn.parseObjects(df, "json"))
        .select(Brooklyn.imageSizes(element_at(col("o.images"), 1)).as("s"))
        .select(col("s.height"), col("s.width")).collect().head
      (r.getAs[Integer](0), r.getAs[Integer](1))
    }
    assert(sizesOf(fixture("image_details.json")) == ((1152, 1536)))
    assert(sizesOf(fixture("image_nosize.json")) == ((null, null)))
  }

  test("image urls get https completion; thumbnail '' passes through " +
      "(_get_images)") {
    val r = Seq(s"""{"images":[${fixture("image_details.json")}]}""")
      .toDF("json")
      .transform(df => Brooklyn.parseObjects(df, "json"))
      .select(Brooklyn.images(element_at(col("o.images"), 1)).as("i"))
      .select(col("i.url"), col("i.thumb")).collect().head
    assert(r.getString(0) == "https://d1lfxha3ugu3d4.cloudfront.net/" +
      "images/opencollection/objects/size4/CUR.66.242.29.jpg")
    assert(r.getString(1) == "https://d1lfxha3ugu3d4.cloudfront.net/" +
      "images/opencollection/objects/size0_sq/CUR.66.242.29.jpg")
  }

  test("metadata matches the golden metadata.json, nulls preserved " +
      "(test_get_metadata)") {
    val m = Seq(fixture("object_data.json")).toDF("json")
      .transform(df => Brooklyn.parseObjects(df, "json"))
      .select(Brooklyn.metaData(col("o")).as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(m == Map(
      "accession_number" -> "66.242.29",
      "date" -> null,
      "description" -> null,
      "medium" -> "Silk",
      "credit_line" -> "Gift of John C. Monks",
      "classification" -> "Clothing"))
  }

  test("creator is the first rank-1 artist (test_get_creators)") {
    val c = Seq(fixture("artists_details.json")).toDF("json")
      .transform(df => Brooklyn.parseObjects(df, "json"))
      .select(Brooklyn.creators(col("o")).as("c"))
      .collect().head.getAs[String]("c")
    assert(c == "John La Farge")
  }

  test("golden end-to-end: object_data.json emits one CC-BY image row " +
      "(test_handle_object_data); objects without images emit none " +
      "(test_handle_object_noimage_info)") {
    val out = Brooklyn.imageRows(
      Seq(fixture("object_data.json")).toDF("json")
        .transform(df => Brooklyn.parseObjects(df, "json"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("license_url") ==
      "https://creativecommons.org/licenses/by/3.0/")
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://www.brooklynmuseum.org/opencollection/objects/90636")
    assert(r.getAs[String]("title") == "Caftan")
    assert(r.getAs[Int]("width") == 1536 && r.getAs[Int]("height") == 1152)

    assert(Brooklyn.imageRows(
      Seq(fixture("object_data_noimage.json")).toDF("json")
        .transform(df => Brooklyn.parseObjects(df, "json"))).count() == 0)

    // non-CC rights drop the whole object (test_process_objects_batch_failure)
    assert(Brooklyn.imageRows(
      Seq(fixture("non_cc_object_data.json")).toDF("json")
        .transform(df => Brooklyn.parseObjects(df, "json"))).count() == 0)
  }
}
