package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the PhyloPic extraction, pinned
  * against the reference's fixture JSON and the cases of
  * test_phylopic.py. */
class PhylopicSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/phylopic"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  private def detailsOf(name: String) =
    Phylopic.parseDetails(Seq(fixture(name)).toDF("json"), "json")

  test("image info: widest png >= 257 wins, 256-wide is thumbnail " +
      "else '' (test_get_image_info)") {
    val r = detailsOf("correct_meta_data_example.json")
      .select(Phylopic.imageInfo(col("r")).as("i"))
      .select(col("i.url"), col("i.width"), col("i.height"), col("i.thumb"))
      .collect().head
    assert(r.getString(0) ==
      "http://phylopic.org/assets/images/submissions/e9df48fe-68ea-419e-" +
        "b9df-441e0b208335.1024.png")
    assert(r.getInt(1) == 847 && r.getInt(2) == 1024)
    // the fixture's 256-HEIGHT file is 211 wide: not a thumbnail
    assert(r.getString(3) == "")
  }

  test("no qualifying png nulls the image (test_get_image_info_with_" +
      "no_img_url / test_get_meta_data_with_no_img_url)") {
    assert(Phylopic.imageRows(detailsOf("no_image_url_example.json"))
      .count() == 0)
  }

  test("creator details: name join, credit gating credit_line+pub_date " +
      "(test_get_creator_details)") {
    val r = detailsOf("correct_meta_data_example.json")
      .select(Phylopic.creatorDetails(col("r")).as("c"))
      .select(col("c.creator"), col("c.credit_line"), col("c.pub_date"))
      .collect().head
    assert(r.getString(0) == "Jonathan Wells")
    assert(r.getString(1) == "Jonathan Wells")
    assert(r.getString(2) == "2020-02-26 11:59:53")
  }

  test("taxa details: canonical names, first is title " +
      "(test_get_taxa_details)") {
    val r = detailsOf("correct_meta_data_example.json")
      .select(Phylopic.taxaDetails(col("r")).as("t"))
      .select(col("t.taxa"), col("t.title"))
      .collect().head
    val expectName =
      "Chondrus crispus NODC Taxonomic Code, database (version 8.0) 1996"
    assert(r.getSeq[String](0) == Seq(expectName))
    assert(r.getString(1) == expectName)
  }

  test("golden end-to-end row mirrors test_get_meta_data_correct") {
    val out = Phylopic.imageRows(
      detailsOf("correct_meta_data_example.json")).collect()
    assert(out.length == 1)
    val r = out.head
    val imgUrl = "http://phylopic.org/assets/images/submissions/" +
      "e9df48fe-68ea-419e-b9df-441e0b208335.1024.png"
    assert(r.getAs[String]("foreign_identifier") == imgUrl)
    assert(r.getAs[String]("foreign_landing_url") ==
      "http://phylopic.org/image/e9df48fe-68ea-419e-b9df-441e0b208335")
    assert(r.getAs[String]("image_url") == imgUrl)
    assert(r.getAs[String]("thumbnail_url") == "")
    assert(r.getAs[String]("width") == "847")
    assert(r.getAs[String]("height") == "1024")
    assert(r.getAs[String]("license_url") ==
      "http://creativecommons.org/publicdomain/zero/1.0/")
    assert(r.getAs[String]("creator") == "Jonathan Wells")
    assert(r.getAs[String]("title") ==
      "Chondrus crispus NODC Taxonomic Code, database (version 8.0) 1996")
    val m = r.getStruct(r.fieldIndex("meta_data"))
    assert(m.getSeq[String](m.fieldIndex("taxa")).head.startsWith("Chondrus"))
    assert(m.getAs[String]("credit_line") == "Jonathan Wells")
    assert(m.getAs[String]("pub_date") == "2020-02-26 11:59:53")
  }
}
