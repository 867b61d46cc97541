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
