package graft.crawl

import graft.SparkSpec

/** Behavior tests for the DeviantArt and SVG Silh HTML extractors,
  * mirroring the reference's getMetaData control flow
  * (providers/commoncrawl/DeviantArt.py:20-116, SVGSilh.py:14-111) on
  * synthetic pages shaped like the real markup (the reference ships
  * no fixtures for its commoncrawl extractors). */
class HtmlExtractorsSpec extends SparkSpec {

  private val deviantPage =
    """<html><head>
      |<meta property="og:title" content="Starry   Night Remix" />
      |<meta property="og:url" content="https://www.deviantart.com/artx/art/starry-123" />
      |<meta property="og:image" content="https://images-wixmp.example/f/abc.jpg" />
      |<meta property="og:image:width" content="1024" />
      |<meta property="og:image:height" content="768" />
      |</head><body>
      |<a href="https://creativecommons.org/licenses/by-nc-sa/3.0/" rel="license">CC</a>
      |<small class="author">by
      |  <a class="u regular username" href="https://artx.deviantart.com">ArtX</a>
      |</small>
      |<div class="text block">A <b>remix</b> of the classic.
      |</div>
      |<div class="dev-page-view view-mode-normal" gmi-deviationid=" 7731 ">
      |</div></body></html>""".stripMargin

  test("DeviantArt: full golden row (DeviantArt.py:20-116)") {
    val out = DeviantArt.extract("https://page", deviantPage)
    assert(out.isDefined)
    val r = out.get
    assert(r.foreign_identifier == "7731")
    assert(r.foreign_landing_url ==
      "https://www.deviantart.com/artx/art/starry-123")
    assert(r.image_url == "https://images-wixmp.example/f/abc.jpg")
    assert(r.width == "1024" && r.height == "768")
    assert(r.license == "by-nc-sa" && r.license_version == "3.0")
    assert(r.title == "Starry Night Remix")
    assert(r.creator == "ArtX")
    assert(r.creator_url == "https://artx.deviantart.com")
    assert(r.description == "A remix of the classic.")
  }

  test("DeviantArt: placeholder image, missing license, and missing " +
      "id each yield nothing (DeviantArt.py:53-55,65-67,100-105)") {
    val placeholder = deviantPage.replace(
      "https://images-wixmp.example/f/abc.jpg",
      "https://st.deviantart.net/main/logo/card_black_large.png")
    assert(DeviantArt.extract("u", placeholder).isEmpty)
    val noLicense = deviantPage.replace("rel=\"license\"", "rel=\"nofollow\"")
    assert(DeviantArt.extract("u", noLicense).isEmpty)
    val badLicense = deviantPage.replace(
      "https://creativecommons.org/licenses/by-nc-sa/3.0/",
      "https://example.com/terms")
    assert(DeviantArt.extract("u", badLicense).isEmpty)
    val noId = deviantPage.replace("gmi-deviationid", "data-other")
    assert(DeviantArt.extract("u", noId).isEmpty)
  }

  private def svgCard(lic: String, n: Int) =
    s"""<div class="card mb-3 box-shadow h-100">
       |<a href="/image/$n.html"><img src="/svg/$n.svg" /></a>
       |<p property="dct:title"><a>cat</a>, <a>animal</a></p>
       |<a rel="license" href="$lic">license</a>
       |</div>""".stripMargin

  private def svgPage(cards: String) =
    s"""<html><head>
       |<meta property="og:image" content="https://svgsilh.com/png/123.png" />
       |<meta property="og:description" content="cat silhouette (free) - SVG Silh" />
       |</head><body>$cards</body></html>""".stripMargin

  test("SvgSilh: one row per CC0 card with svg->png swap " +
      "(SVGSilh.py:44-105)") {
    val out = SvgSilh.extract("u", svgPage(
      svgCard("https://creativecommons.org/publicdomain/zero/1.0/", 1) +
        svgCard("https://creativecommons.org/licenses/by/4.0/", 2) +
        svgCard("https://creativecommons.org/publicdomain/zero/1.0/", 3)))
    // the by-4.0 card is dropped: CC0-only provider
    assert(out.length == 2)
    val r = out.head
    assert(r.foreign_landing_url == "https://svgsilh.com/image/1.html")
    assert(r.image_url == "https://svgsilh.com/png/1.png")
    assert(r.svg_url == "https://svgsilh.com/svg/1.svg")
    assert(r.license == "cc0" && r.license_version == "1.0")
    assert(r.title == "cat silhouette")
    assert(r.tags == Seq("cat", "animal"))
  }

  test("SvgSilh: foreign-domain og:image drops the page " +
      "(SVGSilh.py:76-78)") {
    val foreign = svgPage(
      svgCard("https://creativecommons.org/publicdomain/zero/1.0/", 1))
      .replace("https://svgsilh.com/png/123.png",
        "https://other-cdn.example/png/123.png")
    assert(SvgSilh.extract("u", foreign).isEmpty)
  }

  test("extractAll runs as a typed flatMap over fetched pages") {
    import spark.implicits._
    val pages = Seq(
      WarcStore.FetchedPage("https://page1", deviantPage),
      WarcStore.FetchedPage("https://page2", "<html></html>")).toDS
    val out = DeviantArt.extractAll(pages).collect()
    assert(out.length == 1 && out.head.foreign_identifier == "7731")
  }
}
