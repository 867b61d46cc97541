package graft.maintain

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("subProviderReassign swaps source only for mapped keys (J3)") {
    implicit val s = spark
    val df = Seq(("https://flickr.com/u/nasa", "flickr"),
      ("https://flickr.com/u/rando", "flickr"))
      .toDF("creator_url", "source")
    val out = Maintenance.subProviderReassign(df, "creator_url", "source",
      Map("https://flickr.com/u/nasa" -> "nasa")).orderBy("creator_url").collect()
    assert(out.map(_.getAs[String]("source")).toSeq == Seq("nasa", "flickr"))
  }

  test("normalizedUrlKey joins scheme/slash variants (J6)") {
    val k = Seq("HTTP://X.org/a/", "https://x.org/a", "x?").toDF("u")
      .select(Maintenance.normalizedUrlKey(col("u"))).collect()
    assert(k(0).getString(0) == k(1).getString(0))
  }

  test("hexPrefixSlice partitions rows disjointly (P11)") {
    val df = (1 to 200).map(_.toString).toDF("k")
    val a = Maintenance.hexPrefixSlice(df, col("k"), "0", "8").count()
    val b = Maintenance.hexPrefixSlice(df, col("k"), "8", "g").count()
    assert(a + b == 200)
    assert(a > 0 && b > 0)
  }

  // The three sub-provider acceptance rows, mirrored from the
  // reference's loader tests with the REAL dictionaries.

  test("flickr sub-provider update: NASA photostream reassigns, others " +
      "keep provider source (test_sql.py:1272)") {
    implicit val s = spark
    val images = Seq(
      ("a", "https://www.flickr.com/photos/29988733@N04", "flickr", "flickr"),
      ("b", "https://www.flickr.com/photos/other_user", "flickr", "flickr"))
      .toDF("foreign_identifier", "creator_url", "provider", "source")
    val out = Maintenance.updateFlickrSubProviders(images)
      .orderBy("foreign_identifier").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("source") == "nasa") // NASA Johnson NSID
    assert(out(1).getAs[String]("source") == "flickr")
  }

  test("europeana sub-provider update: Wellcome Collection in the " +
      "dataProvider array reassigns, others keep source (test_sql.py:1332)") {
    val images = Seq(
      ("a", Map("dataProvider" -> """["Wellcome Collection"]""",
        "description" -> "A"), "europeana", "europeana"),
      ("b", Map("dataProvider" -> """["Other Collection"]""",
        "description" -> "B"), "europeana", "europeana"))
      .toDF("foreign_identifier", "meta_data", "provider", "source")
    val out = Maintenance.updateEuropeanaSubProviders(images)
      .orderBy("foreign_identifier").collect()
    assert(out(0).getAs[String]("source") == "wellcome_collection")
    assert(out(1).getAs[String]("source") == "europeana")
  }

  test("smithsonian sub-provider update: unit codes map to museum " +
      "sources; already-updated rows untouched (test_sql.py:1398)") {
    val images = Seq(
      ("a", Map("unit_code" -> "SIA"), "smithsonian", "smithsonian"),
      ("b", Map("unit_code" -> "NMNHBIRDS"), "smithsonian", "smithsonian"),
      ("c", Map("unit_code" -> "SIA"), "smithsonian", "already_done"),
      ("d", Map("unit_code" -> "SIA"), "flickr", "flickr"))
      .toDF("foreign_identifier", "meta_data", "provider", "source")
    val out = Maintenance.updateSmithsonianSubProviders(images)
      .orderBy("foreign_identifier").collect()
    assert(out.map(_.getAs[String]("source")).toSeq == Seq(
      "smithsonian_institution_archives",
      "smithsonian_national_museum_of_natural_history",
      "already_done", "flickr"))
  }

  test("smithsonian sub-provider update raises on an unknown unit code " +
      "(sql.py:603-605)") {
    val images = Seq(
      ("a", Map("unit_code" -> "NOPE"), "smithsonian", "smithsonian"))
      .toDF("foreign_identifier", "meta_data", "provider", "source")
    val e = intercept[Exception] {
      Maintenance.updateSmithsonianSubProviders(images).collect()
    }
    assert(e.getMessage.contains("unknown unit code") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown unit code")))
  }
}

class ReingestionSpec extends AnyFunSuite {
  test("tiered day shifts accumulate offsets (helpers.py:1-27)") {
    val tiers = Reingestion.dayShiftTiers(Seq((1, 3), (2, 2)))
    assert(tiers == Seq(Seq(1, 2, 3), Seq(5, 7)))
  }

  test("half-hour window generator emits 48 contiguous windows (flickr.py:95-122)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val wins = Seq("2024-01-01").toDF("d")
      .select(Reingestion.halfHourWindows(col("d")).as("w"))
      .select(explode(col("w")).as("win"))
      .select(col("win.win_start"), col("win.win_end"))
      .collect()
    assert(wins.length == 48)
    assert(wins.head.getLong(0) == java.time.LocalDate.of(2024, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond)
    wins.foreach(w => assert(w.getLong(1) - w.getLong(0) == 1800))
    wins.sliding(2).foreach(p =>
      assert(p(0).getLong(1) == p(1).getLong(0)))
  }

  test("production schedule yields 103 distinct backfill dates") {
    val dates = Reingestion.reingestionDates(LocalDate.of(2024, 6, 1))
    assert(dates.length == 7 + 12 + 20 + 24 + 24 + 16)
    assert(dates.distinct.length == dates.length)
    assert(dates.head == LocalDate.of(2024, 5, 31))
  }
}
