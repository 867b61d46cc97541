package graft.crawl

import graft.SparkSpec

/** Behavior tests for the Thorvaldsens, WoRMS, Geograph UK and IHA
  * HTML extractors on synthetic pages shaped like the real markup
  * (the reference ships no fixtures for its commoncrawl
  * extractors). */
class HtmlExtractors2Spec extends SparkSpec {

  test("Thorvaldsens: license anchor's about attr is the image; " +
      "small thumbnail; img tag dims (ThorvaldsensMuseum.py:47-90)") {
    val html =
      """<html><body>
        |<a rel="license" href="https://creativecommons.org/publicdomain/zero/1.0/"
        |   about="https://thorvaldsensmuseum.dk/images/large/a41.jpg">CC0</a>
        |<img src="https://thorvaldsensmuseum.dk/images/large/a41.jpg"
        |     width="900" height="600" alt="Jason  with the
        |Golden Fleece" />
        |<div class="artists">Bertel Thorvaldsen
        |  <a class="standard" href="/en/artists/bertel">more</a>
        |</div></body></html>""".stripMargin
    val out = Thorvaldsens.extract("https://page/41", html)
    assert(out.isDefined)
    val r = out.get
    assert(r.image_url == "https://thorvaldsensmuseum.dk/images/large/a41.jpg")
    assert(r.thumbnail_url ==
      "https://thorvaldsensmuseum.dk/images/small/a41.jpg")
    assert(r.width == "900" && r.height == "600")
    assert(r.license == "cc0" && r.license_version == "1.0")
    assert(r.title == "Jason with the Golden Fleece")
    assert(r.creator == "Bertel Thorvaldsen")
    assert(r.creator_url == "/en/artists/bertel")
    assert(r.foreign_landing_url == "https://page/41")
    // no about attr -> no image -> no row (ThorvaldsensMuseum.py:64-66)
    assert(Thorvaldsens.extract("u",
      html.replace(" about=\"https://thorvaldsensmuseum.dk/images/large/a41.jpg\"", ""))
      .isEmpty)
  }

  private val wormsHtml =
    """<html><body>
      |<div id="photogallery_share" data-url="https://www.marinespecies.org/photogallery.php?album=1&pic=12345"></div>
      |<div id="photogallery_resized_img">
      |<meta itemprop="license" content="https://creativecommons.org/licenses/by-nc-sa/4.0/" />
      |<img src="https://images.marinespecies.org/resized/12345.jpg"
      |     width="800.0" height="533" title="Chondrus crispus" />
      |</div>
      |<span class="photogallery_caption photogallery_descr"><b>Description</b>
      |  <span class="photogallery_caption photogallery_text">A red alga.</span>
      |</span>
      |<span class="photogallery_caption photogallery_author">Author
      |  <a href="https://www.marinespecies.org/users/42">Jane Doe</a>
      |</span>
      |</body></html>""".stripMargin

  test("WoRMS: p=image page golden row (WoRMS.py:46-149)") {
    val out = Worms.extract(
      "https://www.marinespecies.org/photogallery.php?p=image&pic=12345",
      wormsHtml)
    assert(out.isDefined)
    val r = out.get
    assert(r.foreign_identifier == "12345")
    assert(r.foreign_landing_url ==
      "https://www.marinespecies.org/photogallery.php?album=1&pic=12345")
    assert(r.image_url == "https://images.marinespecies.org/resized/12345.jpg")
    assert(r.thumbnail_url ==
      "https://images.marinespecies.org/thumbs/12345.jpg")
    assert(r.width == 800 && r.height == 533)
    assert(r.license == "by-nc-sa" && r.license_version == "4.0")
    assert(r.title == "Chondrus crispus")
    assert(r.creator == "Jane Doe")
    assert(r.creator_url == "https://www.marinespecies.org/users/42")
    assert(r.description == "A red alga.")
  }

  test("WoRMS: taxdetails pages and unlicensed pages yield nothing " +
      "(WoRMS.py:71-73,151-156)") {
    assert(Worms.extract(
      "https://www.marinespecies.org/aphia.php?p=taxdetails&id=1",
      wormsHtml).isEmpty)
    assert(Worms.extract(
      "https://www.marinespecies.org/photogallery.php?p=image&pic=1",
      wormsHtml.replace("itemprop=\"license\"", "itemprop=\"other\""))
      .isEmpty)
  }

  test("Geograph UK: golden row with geo metadata " +
      "(GeographOrgUK.py:50-139)") {
    val html =
      """<html><head>
        |<link rel="canonical" href="https://www.geograph.org.uk/photo/654321" />
        |</head><body>
        |<a rel="license" href="https://creativecommons.org/licenses/by-sa/2.0/">cc</a>
        |<div id="mainphoto"><img src="https://s0.geograph.org.uk/photos/65/43/654321.jpg" width="640" height="480" /></div>
        |<strong property="dct:title">A  Quiet Lane</strong>
        |<a rel="author" href="/profile/789">Sam Photographer</a>
        |<span class="tag">lane</span><span class="tag">rural</span>
        |<abbr class="latitude" title="51.5000"></abbr>
        |<abbr class="longitude" title="-0.1200"></abbr>
        |<span itemprop="exifData">Taken: 12 May 2019</span>
        |<div itemprop="description">A quiet lane in <b>May</b>.</div>
        |</body></html>""".stripMargin
    val out = GeographUk.extract("https://page", html)
    assert(out.isDefined)
    val r = out.get
    assert(r.foreign_identifier == "654321")
    assert(r.foreign_landing_url == "https://www.geograph.org.uk/photo/654321")
    assert(r.image_url == "https://s0.geograph.org.uk/photos/65/43/654321.jpg")
    assert(r.width == "640" && r.height == "480")
    assert(r.license == "by-sa" && r.license_version == "2.0")
    assert(r.title == "A Quiet Lane")
    assert(r.creator == "Sam Photographer")
    assert(r.creator_url == "https://www.geograph.org.uk/profile/789")
    assert(r.tags == Seq("lane", "rural"))
    assert(r.latitude == "51.5000" && r.longitude == "-0.1200")
    assert(r.date_taken == "Taken: 12 May 2019")
    assert(r.description == "A quiet lane in May.")
  }

  test("IHA: one row per swiper slide with about attr; watermarked " +
      "flag; page keywords (IHA.py:52-114)") {
    val html =
      """<html><head>
        |<meta property="og:url" content="https://www.iha.com/rental/123" />
        |<meta name="keywords" content="villa,beach,rental" />
        |</head><body><div class="ph">
        |<span class="swiper-slide" about="https://cdn.iha.com/p/1.jpeg">
        |  <a rel="license" href="https://creativecommons.org/licenses/by-nd/4.0/">cc</a>
        |  <img src="https://cdn.iha.com/t/1.jpeg" alt="Pool  view" width="300" height="200" title="Villa pool" />
        |</span>
        |<span class="swiper-slide">
        |  <a rel="license" href="https://creativecommons.org/licenses/by-nd/4.0/">cc</a>
        |  <img src="https://cdn.iha.com/t/2.jpeg" />
        |</span>
        |</div></body></html>""".stripMargin
    val out = Iha.extract("https://page", html)
    // the second slide has no about attr -> skipped
    assert(out.length == 1)
    val r = out.head
    assert(r.foreign_identifier == "https://cdn.iha.com/p/1.jpeg")
    assert(r.image_url == "https://cdn.iha.com/p/1.jpeg")
    assert(r.thumbnail_url == "https://cdn.iha.com/t/1.jpeg")
    assert(r.foreign_landing_url == "https://www.iha.com/rental/123")
    assert(r.license == "by-nd" && r.license_version == "4.0")
    assert(r.title == "Villa pool")
    assert(r.image_alt_text == "Pool view")
    assert(r.tags == "villa,beach,rental")
    assert(r.watermarked == "t")
  }
}
