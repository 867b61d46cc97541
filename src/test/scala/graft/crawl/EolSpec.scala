package graft.crawl

import graft.SparkSpec

/** Golden-output tests for the EOL extractor, specified from
  * EOL.py:28-296's behavior on its two page shapes (the reference
  * ships no EOL fixtures, so these fixtures reproduce the structures
  * its BeautifulSoup selectors walk). */
class EolSpec extends SparkSpec {

  private val dataObjectPage =
    """<html><head>
      |<meta name="keywords" content="Quercus robur, oak, tree" />
      |<meta property="og:title" content="English Oak - Encyclopedia of Life" />
      |<meta property="og:url" content="https://eol.org/data_objects/12345" />
      |</head><body>
      |<div class="media"><a href="https://media.eol.org/full/oak.jpg">
      |<img src="https://media.eol.org/thumb/oak.jpg"></a></div>
      |<div class="article source">
      |<a href="http://creativecommons.org/licenses/by-sa/3.0/">CC BY-SA</a>
      |<p title="Rights holder">Royal Botanic Gardens</p>
      |<p>Creator: <a href="/users/99">Jane Botanist</a></p>
      |</div>
      |</body></html>""".stripMargin

  private val taxonPage =
    """<html><head>
      |<meta name="keywords" content="fungi" />
      |<meta property="og:title" content="Amanita - EOL" />
      |</head><body>
      |<div class="images">
      |<div class="image">
      |<a href="/data_objects/111"><img data-data-object-id="111"
      | data-thumb="https://m.eol.org/t/111.jpg"
      | src="https://m.eol.org/f/111.jpg" alt="cap"></a>
      |<div class="attribution">
      |<a href="http://creativecommons.org/licenses/by/2.0/">by</a>
      |<p class="copy">Copyright Alice Mycologist</p>
      |</div>
      |</div>
      |<div class="image">
      |<a href="/data_objects/222"><img data-data-object-id="222"
      | src="https://m.eol.org/f/222.jpg"></a>
      |<div class="attribution">
      |<a href="http://creativecommons.org/publicdomain/zero/1.0/">cc0</a>
      |<p class="copy">Bob Forager</p>
      |</div>
      |</div>
      |<div class="image">
      |<a href="/data_objects/333"><img data-data-object-id="333"
      | src="https://m.eol.org/f/333.jpg"></a>
      |</div>
      |</div>
      |</body></html>""".stripMargin

  test("data_objects page yields one row with og-derived id and credits") {
    val out = Eol.extract("https://eol.org/data_objects/12345", dataObjectPage)
    assert(out.length == 1)
    val r = out.head
    assert(r.foreign_identifier == "12345")
    assert(r.foreign_landing_url == "https://eol.org/data_objects/12345")
    assert(r.image_url == "https://media.eol.org/full/oak.jpg")
    assert(r.license_path == "/licenses/by-sa/3.0/")
    assert(r.title == "English Oak") // og:title cut at ' - ' (EOL.py:70)
    assert(r.creator == "Jane Botanist")
    assert(r.rights_holder == "Royal Botanic Gardens")
    assert(r.tags == Seq("Quercus robur", "oak", "tree"))
  }

  test("taxon page yields one row per image block; per-block fields " +
      "reset; license-less blocks are skipped (EOL.py:192-288)") {
    val out = Eol.extract("https://eol.org/pages/777", taxonPage)
    assert(out.length == 2) // third block has no attribution -> skipped
    val first = out.head
    assert(first.foreign_identifier == "111")
    assert(first.foreign_landing_url == "https://eol.org/pages/777")
    assert(first.image_url == "https://m.eol.org/f/111.jpg")
    assert(first.thumbnail_url == "https://m.eol.org/t/111.jpg")
    assert(first.license_path == "/licenses/by/2.0/")
    assert(first.creator == "Alice Mycologist") // 'Copyright' stripped
    assert(first.title == "Amanita")
    val second = out(1)
    assert(second.foreign_identifier == "222")
    assert(second.thumbnail_url == "") // no carryover from block 1
    assert(second.license_path == "/publicdomain/zero/1.0/")
  }

  test("pages without a gallery or media block yield nothing") {
    assert(Eol.extract("https://eol.org/pages/1", "<html></html>").isEmpty)
    assert(Eol.extract("https://eol.org/data_objects/1",
      "<html><div class=\"media\"></div></html>").isEmpty)
  }

  test("extractAll distributes as a typed flatMap") {
    import spark.implicits._
    val pages = Seq(
      WarcStore.FetchedPage("https://eol.org/data_objects/12345", dataObjectPage),
      WarcStore.FetchedPage("https://eol.org/pages/777", taxonPage)).toDS()
    val rows = Eol.extractAll(pages).collect()
    assert(rows.length == 3)
    assert(rows.map(_.foreign_identifier).toSet == Set("12345", "111", "222"))
  }
}
