package graft.providers

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior tests for the Thingiverse extraction on synthetic API
  * payloads shaped like the real ones (upstream ships no fixtures
  * for this script). */
class ThingiverseSpec extends SparkSpec {
  import spark.implicits._

  private val thing =
    """{"id":12345,"name":"Benchy  Boat","license":
      |"Creative Commons - Public Domain Dedication",
      |"description":"A  calibration  boat",
      |"public_url":"https://www.thingiverse.com/thing:12345",
      |"creator":{"first_name":"Ada","last_name":"Maker","name":"adamaker",
      |"public_url":"https://www.thingiverse.com/adamaker"}}"""
      .stripMargin.replaceAll("\n", "")

  private val tagsJson = """[{"name":" boat "},{"name":"calibration"}]"""

  private val files =
    """[{"default_image":{"id":777,"url":"https://cdn.tv/m/777.stl",
      |"sizes":[
      |{"type":"display","size":"medium","url":"https://cdn.tv/i/777_m.jpg"},
      |{"type":"display","size":"large","url":"https://cdn.tv/i/777_l.jpg"},
      |{"type":"preview","size":"tiny","url":"https://cdn.tv/i/777_t.jpg"}]}},
      |{"default_image":null}]""".stripMargin.replaceAll("\n", "")

  private def rowsOf(t: String, tg: String, f: String) =
    Thingiverse.imageRows(
      Seq((t, tg, f)).toDF("thing", "tags", "files"),
      "thing", "tags", "files")

  test("golden row: CC0 gate, size fold, creator join, tag names " +
      "(Thingiverse.py:64-181)") {
    val out = rowsOf(thing, tagsJson, files).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("foreign_identifier") == "777")
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://www.thingiverse.com/thing:12345")
    assert(r.getAs[String]("image_url") == "https://cdn.tv/i/777_l.jpg")
    assert(r.getAs[String]("thumbnail_url") == "https://cdn.tv/i/777_m.jpg")
    assert(r.getAs[String]("license") == "CC0")
    assert(r.getAs[String]("creator") == "Ada Maker")
    assert(r.getAs[String]("creator_url") ==
      "https://www.thingiverse.com/adamaker")
    assert(r.getAs[String]("title") == "Benchy Boat")
    val m = r.getMap[String, String](r.fieldIndex("meta_data"))
    assert(m("description") == "A calibration boat")
    assert(m("3d_model") == "https://cdn.tv/m/777.stl")
    assert(r.getSeq[String](r.fieldIndex("tags")) ==
      Seq("boat", "calibration"))
  }

  test("non-CC0 license drops the thing; medium-only sizes backfill " +
      "the image from the thumbnail (Thingiverse.py:65-68,154-155)") {
    val byLicense = thing.replace(
      "Creative Commons - Public Domain Dedication",
      "Creative Commons - Attribution")
    assert(rowsOf(byLicense, tagsJson, files).count() == 0)

    val mediumOnly = files.replace(
      """{"type":"display","size":"large","url":"https://cdn.tv/i/777_l.jpg"},""",
      "")
    val r = rowsOf(thing, tagsJson, mediumOnly).collect().head
    assert(r.getAs[String]("image_url") == "https://cdn.tv/i/777_m.jpg")
    assert(r.getAs[String]("thumbnail_url") == "https://cdn.tv/i/777_m.jpg")
  }

  test("blank first/last name falls back to creator.name; missing " +
      "public_url builds the thing url (Thingiverse.py:84-98)") {
    val anon = thing
      .replace("\"first_name\":\"Ada\"", "\"first_name\":\"\"")
      .replace("\"last_name\":\"Maker\"", "\"last_name\":\"\"")
      .replace(""""public_url":"https://www.thingiverse.com/thing:12345",""",
        "")
    val r = rowsOf(anon, tagsJson, files).collect().head
    assert(r.getAs[String]("creator") == "adamaker")
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://www.thingiverse.com/thing:12345")
  }
}
