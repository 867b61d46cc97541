package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ImageStore preparation semantics, porting the behaviors asserted in
  * common/storage/test_image.py (789 lines): tag blacklist +
  * enrichment, meta_data injection, URL-vs-string cleaning, required
  * row drops. */
class ImageStoreSpec extends SparkSpec {
  import spark.implicits._

  test("tag blacklist: exact bans and substring bans (test_image.py blacklist cases)") {
    val cases = Seq(
      "no person" -> true, "squareformat" -> true, // exact
      "uploaded:by=flickr" -> true, "flickriosapp" -> true, // substring
      "by-nc-nd" -> true, "pdm" -> true,
      "nature" -> false, "dog" -> false)
    cases.foreach { case (tag, banned) =>
      val r = Seq(tag).toDF("t")
        .select(ImageStore.tagBlacklisted(col("t"))).collect().head.getBoolean(0)
      assert(r == banned, s"tag=$tag")
    }
  }

  test("enrichTags filters blacklisted and wraps in {name, provider}; null stays null") {
    val df = Seq((Seq("dog", "no person", "cat"), 1), (null, 2))
      .toDF("tags", "i").orderBy("i")
    val out = df.select(ImageStore.enrichTags(col("tags"), "flickr").as("tags"))
      .collect()
    val enriched = out(0).getSeq[org.apache.spark.sql.Row](0)
    assert(enriched.map(r => (r.getString(0), r.getString(1))).toList ==
      List(("dog", "flickr"), ("cat", "flickr")))
    assert(out(1).isNullAt(0))
  }

  test("enrichMetaData injects license urls; argument wins over dict (image.py:371-384)") {
    val df = Seq(
      (Map("k" -> "v", "license_url" -> "stale"), "https://l", "https://raw"),
      (null, "https://l2", null))
      .toDF("meta", "lu", "rlu")
    val out = df.select(ImageStore.enrichMetaData(col("meta"), col("lu"),
      col("rlu")).as("m")).collect()
    val m0 = out(0).getAs[Map[String, String]]("m")
    assert(m0 == Map("k" -> "v", "license_url" -> "https://l",
      "raw_license_url" -> "https://raw"))
    val m1 = out(1).getAs[Map[String, String]]("m")
    assert(m1("license_url") == "https://l2")
  }

  test("prepare: mediatype gate drops non-image rows when enabled (P9, " +
      "wikimedia_commons.py:259-269)") {
    val rows = Seq(
      ("f1", "BITMAP"), ("f2", "AUDIO"), ("f3", "DRAWING"))
      .toDF("foreign_identifier", "mediatype")
      .withColumn("foreign_landing_url", lit("https://ok.example.com/x"))
      .withColumn("image_url", lit("https://img.example.com/x.jpg"))
      .withColumn("thumbnail_url", lit(null).cast("string"))
      .withColumn("width", lit(null).cast("string"))
      .withColumn("height", lit(null).cast("string"))
      .withColumn("filesize", lit(null).cast("string"))
      .withColumn("license_", lit("by"))
      .withColumn("license_version", lit("4.0"))
      .withColumn("creator", lit(null).cast("string"))
      .withColumn("creator_url", lit(null).cast("string"))
      .withColumn("title", lit(null).cast("string"))
      .withColumn("meta_data", lit(null).cast("map<string,string>"))
      .withColumn("tags", lit(null).cast("array<string>"))
      .withColumn("watermarked", lit(null).cast("string"))
      .withColumn("source", lit(null).cast("string"))
      .withColumn("license_url", lit("https://l"))
      .withColumn("raw_license_url", lit(null).cast("string"))
    val gated = ImageStore.prepare(rows, "wikimedia",
      imageMediatypes = Some(Seq("BITMAP", "DRAWING")))
    assert(gated.collect().map(_.getAs[String]("foreign_identifier")).sorted
      .toSeq == Seq("f1", "f3"))
    assert(!gated.columns.contains("mediatype")) // consumed by the gate
    // default: no gate, all three survive
    assert(ImageStore.prepare(rows, "wikimedia").count() == 3)
  }

  test("prepare: cleans, enriches, drops rows missing required fields (P7)") {
    val rows = Seq(
      // valid row
      ("f1", "https://ok.example.com/1", "https://img.example.com/1.jpg",
        null, "100.7", "  Creator  Name ", "by", "4.0"),
      // missing image_url -> dropped
      ("f2", "https://ok.example.com/2", null, null, "50", "x", "by", "4.0"),
      // invalid landing url -> dropped
      ("f3", "notaurl", "https://img.example.com/3.jpg", null, "50", "x", "by", "4.0"))
      .toDF("foreign_identifier", "foreign_landing_url", "image_url",
        "thumbnail_url", "width", "creator", "license_", "license_version")
      .withColumn("height", lit(null).cast("string"))
      .withColumn("filesize", lit(null).cast("string"))
      .withColumn("creator_url", lit(null).cast("string"))
      .withColumn("title", lit(null).cast("string"))
      .withColumn("meta_data", lit(null).cast("map<string,string>"))
      .withColumn("tags", lit(null).cast("array<string>"))
      .withColumn("watermarked", lit("f"))
      .withColumn("source", lit(null).cast("string"))
      .withColumn("license_url", lit("https://creativecommons.org/licenses/by/4.0/"))
      .withColumn("raw_license_url", lit("http://raw"))
    val out = ImageStore.prepare(rows, "flickr").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("foreign_identifier") == "f1")
    assert(r.getAs[Int]("width") == 100)
    assert(r.getAs[String]("creator") == "Creator Name") // sanitized
    assert(r.getAs[String]("watermarked") == "f")
    assert(r.getAs[String]("source") == "flickr") // defaulted
    assert(r.getAs[Map[String, String]]("meta_data")("license_url")
      == "https://creativecommons.org/licenses/by/4.0/")
  }
}
