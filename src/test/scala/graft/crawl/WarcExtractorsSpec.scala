package graft.crawl

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

/** S3 byte-range point reads + §2.9 extractor UDTFs. */
class WarcExtractorsSpec extends SparkSpec {
  import spark.implicits._

  private def gzip(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8")); g.close()
    bos.toByteArray
  }

  test("WarcStore fetches and inflates gzip members by (offset, length)") {
    val dir = Files.createTempDirectory("warc").toString
    val m1 = gzip("<html>page one</html>")
    val m2 = gzip("<html>page two</html>")
    val f = new FileOutputStream(s"$dir/f1.warc.gz")
    f.write(m1); f.write(m2); f.close()

    val refs = Seq(
      WarcStore.WarcRef("u1", "f1.warc.gz", 0, m1.length),
      WarcStore.WarcRef("u2", "f1.warc.gz", m1.length, m2.length)).toDS()
    val pages = WarcStore.fetchPages(refs, dir).collect().sortBy(_.url)
    assert(pages.map(_.html).toSeq ==
      Seq("<html>page one</html>", "<html>page two</html>"))
  }

  test("gallery extractor yields one row per image block (EOL-style 1->N)") {
    val html =
      """<html><body>
        |<a rel="license" href="https://creativecommons.org/licenses/by/3.0/">CC</a>
        |<a class="image" href="https://eol.example.org/pages/1001"><img src="https://img.example.org/a.jpg" alt="A bird"></a>
        |<p>filler</p>
        |<a class="image" href="https://eol.example.org/pages/1002"><img src="https://img.example.org/b.jpg"></a>
        |</body></html>""".stripMargin
    val ex = new Extractors.GalleryExtractor("eol")
    val rows = ex.extract("https://eol.example.org/gallery", html)
    assert(rows.length == 2)
    assert(rows.map(_.foreign_identifier) == Seq("1001", "1002"))
    assert(rows.head.image_url == "https://img.example.org/a.jpg")
    assert(rows.head.license_path == "/licenses/by/3.0/")
    assert(rows.head.title == "A bird")
    assert(rows(1).title == "")
  }

  test("extractAll runs as a typed flatMap over fetched pages") {
    val pages = Seq(WarcStore.FetchedPage("u",
      """<a class="image" href="https://x/pages/7"><img src="https://x/i.jpg"></a>""")).toDS()
    val out = Extractors.extractAll(pages, new Extractors.GalleryExtractor("eol"))
    assert(out.count() == 1)
  }

  test("flickr-style JSON extraction: size preference and sorted-distinct tags") {
    val json = Seq(
      """{"id":"42","owner":"o1","title":"T","license":"4",
        |"url_m":"https://m.jpg","url_s":"https://s.jpg",
        |"tags":"zebra  apple zebra mango"}""".stripMargin.replace("\n", ""),
      """{"id":null,"owner":"o2","title":"x","license":"1","url_s":"https://s2.jpg","tags":""}""")
      .toDF("json")
    val out = Extractors.flickrStyleFromJson(json, "json").collect()
    assert(out.length == 1) // null id filtered
    val r = out.head
    assert(r.getAs[String]("image_url") == "https://m.jpg") // l missing -> m
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://www.flickr.com/photos/o1/42")
    assert(r.getSeq[String](r.fieldIndex("tags")).toList ==
      List("apple", "mango", "zebra"))
  }

  test("creator-type preference: lowest rank wins, unknown types never win (O5)") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      Seq(("publisher", "P"), ("artist", "A"), ("maker", "M")),
      Seq(("collector", "C"), ("painter", "Q")),
      Seq(("unknown-type", "U")),
      Seq.empty[(String, String)])
      .toDF("raw")
      .select(transform(col("raw"), t =>
        struct(t.getField("_1").as("ctype"), t.getField("_2").as("name")))
        .as("cands"))
    val out = df.select(Extractors.preferredCreator(col("cands")).as("c")).collect()
    assert(out(0).getString(0) == "A") // artist rank 0 beats publisher 4
    assert(out(1).getString(0) == "Q") // painter 3 beats collector 6
    assert(out(2).isNullAt(0)) // unknown type -> no creator
    assert(out(3).isNullAt(0))
  }

  test("metrics extractor scrapes popularity counters + watermark flag") {
    val html =
      """<div class="thumbnail"><a rel="license" href="https://creativecommons.org/licenses/by/2.0/">L</a>
        |<img src="https://img.x/1.jpg">
        |<div class="beicons-pre-thumb">1,234</div>
        |<div class="beicons-pre-eye">9876</div>
        |</div>""".stripMargin
    val ex = new Extractors.MetricsExtractor("behance")
    val rows = ex.extract("https://behance.example/g", html)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.image_url == "https://img.x/1.jpg")
    assert(r.license_path == "/licenses/by/2.0/")
    assert(r.tags.contains("likes=1234"))
    assert(r.tags.contains("views=9876"))
    assert(!r.tags.exists(_.startsWith("comments=")))
    assert(r.tags.contains("watermarked=t"))
  }

  test("replayNewestNonNull collapses history so later non-nulls win (J7/A6)") {
    import graft.loadmerge.Merge
    val hist = Seq(
      ("p", "a", 1L, Option("first"), Option(10)),
      ("p", "a", 2L, Option.empty[String], Option(20)),
      ("p", "a", 3L, Option("third"), Option.empty[Int]),
      ("p", "b", 1L, Option("only"), Option.empty[Int]))
      .toDF("provider", "fid", "v", "title", "width")
    val out = Merge.replayNewestNonNull(hist, "provider", "fid", "v",
      Seq("title", "width")).orderBy("fid").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("title") == "third") // later non-null wins
    assert(out(0).getAs[Int]("width") == 20) // null at v=3 didn't erase
    assert(out(0).getAs[Long]("v") == 3L)
    assert(out(1).getAs[String]("title") == "only")
  }
}
