package graft.providers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tier-4 golden-output tests for the Smithsonian extraction, pinned
  * against the reference's fixture JSON and the parametrized cases of
  * test_smithsonian.py. */
class SmithsonianSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/src/cc_catalog_airflow/dags/provider_api_scripts/" +
      "tests/resources/smithsonian"

  private def fixture(name: String): String = {
    assume(Files.exists(Paths.get(s"$res/$name")), s"fixture $name missing")
    new String(Files.readAllBytes(Paths.get(s"$res/$name")), "UTF-8")
  }

  // creator() drivers: build a one-row frame carrying the two name
  // arrays through the real row schema
  private def creatorOf(ftName: String, isName: String,
      types: Map[String, Int]): Option[String] = {
    val json =
      s"""{"response":{"rows":[{"id":"x","title":"t","content":{
         |"freetext":{"name":$ftName},
         |"indexedStructured":{"name":$isName},
         |"descriptiveNonRepeating":{}}}]}}""".stripMargin
    val rows = Smithsonian.parseRows(Seq(json).toDF("json"), "json")
    val out = rows.select(Smithsonian.creator(
      col("row.content.freetext.name"),
      col("row.content.indexedStructured.name"), types).as("c"))
      .collect().head
    Option(out.getAs[String]("c"))
  }

  private val smallTypes = Map("creator" -> 0, "designer" -> 1, "after" -> 3)

  test("creator ranking mirrors test_smithsonian.py test_get_creator") {
    // freetext known label beats indexed personal_main
    assert(creatorOf("""[{"label":"Creator","content":"Bob"}]""",
      """[{"type":"personal_main","content":"Alice"}]""",
      smallTypes).contains("Bob"))
    // lowest rank wins regardless of order
    assert(creatorOf(
      """[{"label":"Designer","content":"Alice"},
        |{"label":"Creator","content":"Bob"}]""".stripMargin,
      "[]", smallTypes).contains("Bob"))
    // label match is case-insensitive
    assert(creatorOf(
      """[{"label":"AFTER","content":"Bob"},
        |{"label":"DESIGNER","content":"Alice"}]""".stripMargin,
      "[]", smallTypes).contains("Alice"))
    // unknown freetext label falls back to indexed personal_main
    assert(creatorOf("""[{"label":"NotaCreator","content":"Bob"}]""",
      """[{"type":"personal_main","content":"Alice"}]""",
      smallTypes).contains("Alice"))
    // non-personal_main types never win
    assert(creatorOf("[]",
      """[{"type":"impersonal_main","content":"Alice"}]""",
      smallTypes).isEmpty)
    // 'unknown' content is excluded
    assert(creatorOf("""[{"label":"Creator","content":"Unknown artist"}]""",
      "[]", smallTypes).isEmpty)
  }

  test("creators tied at top rank join as 'a; b and c' (smithsonian.py:320-324)") {
    assert(creatorOf(
      """[{"label":"Creator","content":"A"},
        |{"label":"Creator","content":"B"},
        |{"label":"Designer","content":"C"}]""".stripMargin,
      "[]", smallTypes).contains("A and B"))
    assert(creatorOf(
      """[{"label":"Creator","content":"A"},
        |{"label":"Creator","content":"B"},
        |{"label":"Creator","content":"C"}]""".stripMargin,
      "[]", smallTypes).contains("A; B and C"))
  }

  test("meta_data description/label_text concat mirrors " +
      "test_ext_meta_data_description / _label_text") {
    def meta(notes: String): Map[String, String] = {
      val json =
        s"""{"response":{"rows":[{"id":"x","content":{
           |"freetext":{"notes":$notes},
           |"descriptiveNonRepeating":{"unit_code":"SIA"}}}]}}""".stripMargin
      val rows = Smithsonian.parseRows(Seq(json).toDF("json"), "json")
      rows.select(Smithsonian.metaData(col("row.content.freetext.notes"),
        col("row.content.descriptiveNonRepeating.unit_code"),
        col("row.content.descriptiveNonRepeating.data_source"),
        Set("description", "summary")).as("m"))
        .collect().head.getMap[String, String](0).toMap
    }
    assert(meta("""[{"label":"notthis","content":"blah"}]""")
      .get("description").isEmpty)
    assert(meta("""[{"label":"Summary","content":"blah"}]""")("description")
      == "blah")
    assert(meta(
      """[{"label":"Description","content":"blah"},
        |{"label":"Summary","content":"blah"},
        |{"label":"Description","content":"blah"}]""".stripMargin)("description")
      == "blah blah blah")
    assert(meta(
      """[{"label":"notDescription","content":"blah"},
        |{"label":"Summary","content":"blah"},
        |{"label":"Description","content":"blah"}]""".stripMargin)("description")
      == "blah blah")
    assert(meta(
      """[{"label":"Label Text","content":"blah"},
        |{"label":"Summary","content":"halb"}]""".stripMargin)("label_text")
      == "blah")
    // dnr fields always carried when present
    assert(meta("[]")("unit_code") == "SIA")
  }

  test("tags flatten date/object_type/topic/place, dropping empties " +
      "(test_extract_tags)") {
    val json =
      """{"response":{"rows":[{"id":"x","content":{
        |"indexedStructured":{
        |"date":["2000s"],
        |"object_type":["Holotypes","Taxonomic type specimens"],
        |"topic":["Paleogeneral","Protists"],
        |"place":["Indian Ocean"]},
        |"descriptiveNonRepeating":{}}}]}}""".stripMargin
    val rows = Smithsonian.parseRows(Seq(json).toDF("json"), "json")
    val tags = rows.select(Smithsonian.tags(
      col("row.content.indexedStructured")).as("t"))
      .collect().head.getSeq[String](0)
    assert(tags == Seq("2000s", "Holotypes", "Taxonomic type specimens",
      "Paleogeneral", "Protists", "Indian Ocean"))
    val sparse =
      """{"response":{"rows":[{"id":"x","content":{
        |"indexedStructured":{"date":["",""],"place":["Indian Ocean"]},
        |"descriptiveNonRepeating":{}}}]}}""".stripMargin
    val t2 = Smithsonian.parseRows(Seq(sparse).toDF("json"), "json")
      .select(Smithsonian.tags(col("row.content.indexedStructured")).as("t"))
      .collect().head.getSeq[String](0)
    assert(t2 == Seq("Indian Ocean"))
  }

  test("golden end-to-end row from sub_provider_example.json " +
      "(test_process_image_data_with_sub_provider)") {
    val rows = Smithsonian.parseRows(
      Seq(fixture("sub_provider_example.json")).toDF("json"), "json")
    val out = Smithsonian.imageRows(rows).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("foreign_identifier") == "SIA-SIA2010-2358")
    assert(r.getAs[String]("foreign_landing_url") == null)
    assert(r.getAs[String]("image_url") ==
      "https://ids.si.edu/ids/deliveryService?id=SIA-SIA2010-2358")
    assert(r.getAs[String]("thumbnail_url") ==
      "https://ids.si.edu/ids/deliveryService?id=SIA-SIA2010-2358&max=150")
    assert(r.getAs[String]("license_url") == Smithsonian.zeroUrl)
    assert(r.getAs[String]("creator") == "Gruber, Martin A")
    assert(r.getAs[String]("title") ==
      "Views of the National Zoological Park in Washington, DC, " +
        "showing Elephant")
    assert(r.getMap[String, String](r.fieldIndex("meta_data")).toMap == Map(
      "unit_code" -> "SIA",
      "data_source" -> "Smithsonian Institution Archives"))
    assert(r.getSeq[String](r.fieldIndex("tags")) == Seq(
      "1920s", "1910s", "Archival materials", "Photographs", "Animals"))
    assert(r.getAs[String]("source") == "smithsonian_institution_archives")
  }

  test("source: unit code to sub-provider lookup; unknown codes are null") {
    val out = Seq("NMNHBOTANY", "SIA", "NOPE").toDF("u")
      .select(Smithsonian.source(col("u")).as("s")).as[String].collect()
    assert(out(0) == "smithsonian_national_museum_of_natural_history")
    assert(out(1) == "smithsonian_institution_archives")
    assert(out(2) == null)
  }
}
