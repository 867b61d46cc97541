package graft.crawl

import graft.SparkSpec

/** Behavior tests for the FloraOn, McCord, DigitaltMuseum, Science
  * Museum UK, CAPL, Animal Diversity Web, Museums Victoria (HTML) and
  * Behance extractors on synthetic pages shaped like the real markup
  * (the reference ships no fixtures for its commoncrawl
  * extractors). */
class HtmlExtractors3Spec extends SparkSpec {

  test("FloraOn: per-thumbnail rows with hidden-input dims/creator " +
      "and page-level details (FloraOn.py:44-117)") {
    val html =
      """<span class="especie">Quercus  ROBUR</span>
        |<div id="fic-ecologia">
        |<div class="fic-detalhe"><div class="head">Habitat </div>
        |  <div class="content">Woodland</div></div>
        |</div>
        |<div id="fotochooser">
        |<div class="thumbnail">
        |<a rel="license" href="https://creativecommons.org/licenses/by-nc/4.0/">cc</a>
        |<img class="image" src="photos/q1.jpg" alt="oak leaf" />
        |<input name="wid" value="800" /><input name="hei" value="600" />
        |<input name="aut" value="A. Botanist" />
        |</div></div>""".stripMargin
    val out = FloraOn.extract("https://flora-on.pt/#q1", html)
    assert(out.length == 1)
    val r = out.head
    assert(r.image_url == "https://flora-on.pt/photos/q1.jpg")
    assert(r.width == "800" && r.height == "600")
    assert(r.license == "by-nc" && r.license_version == "4.0")
    // python's .strip().lower() keeps internal whitespace verbatim
    assert(r.title == "quercus  robur")
    assert(r.creator == "A. Botanist")
    assert(r.image_alt_text == "oak leaf")
    assert(r.details("habitat") == "Woodland")
    assert(r.watermarked == "t")
  }

  test("McCord: h1 'id | title' split, ObjView->ListView thumbnail, " +
      "artist before ' (' (McCordMuseum.py:75-151)") {
    val html =
      """<a rel="license" href="https://creativecommons.org/licenses/by-nc-nd/2.5/">cc</a>
        |<div class="image"><img src="/ObjView/M930.1.jpg" width="640.0" height="480" alt="View  of port" /></div>
        |<h1 class="vo">M930.50.1.84 | The Port of Montreal</h1>
        |<a title="All tagged images">Harbours</a>
        |<a title="All tagged images">Ships</a>
        |<div id="etiquette"><a href="x?tablename=artist&id=1">John Henry Walker (1831-1899)</a></div>
        |<div id="descriptions">An engraving of the port.</div>""".stripMargin
    val out = McCord.extract("https://page/M930", html)
    assert(out.isDefined)
    val r = out.get
    assert(r.foreign_identifier == "M930.50.1.84")
    assert(r.title == "The Port of Montreal")
    assert(r.image_url ==
      "http://collections.musee-mccord.qc.ca/ObjView/M930.1.jpg")
    assert(r.thumbnail_url ==
      "http://collections.musee-mccord.qc.ca/ListView/M930.1.jpg")
    assert(r.width == 640 && r.height == 480)
    assert(r.license == "by-nc-nd" && r.license_version == "2.5")
    assert(r.creator == "John Henry Walker")
    assert(r.tags == "Harbours,Ships")
    assert(r.description == "An engraving of the port.")
    assert(r.watermarked == "t")
  }

  test("DigitaltMuseum: per-media-item rows with article title, " +
      "credit creator and metadata section (DigitaltMuseum.py:50-163)") {
    val html =
      """<meta property="og:url" content="https://digitaltmuseum.org/0210110" />
        |<div class="article__title"><h1>Fiskebåt</h1></div>
        |<div class="article__leadtext"><p>A fishing boat. Expand text</p></div>
        |<section class="article__metadata"><h2> Metadata </h2>
        |<ul><li>Identifier  NF.1900-01</li><li>Type  Photograph</li></ul>
        |</section>
        |<li class="media__item">
        |<a class="media__license" href="https://creativecommons.org/licenses/by-sa/4.0/">cc</a>
        |<a class="module__media  media--image" href="/021015456789/fiskebat">
        |<img src="https://dms-cf.dimu.org/image/1.jpg" alt="boat at sea" /></a>
        |<i class="media__credit">Foto: Anders Beer Wilse</i>
        |</li>""".stripMargin
    val out = DigitaltMuseum.extract("https://page", html)
    assert(out.length == 1)
    val r = out.head
    assert(r.foreign_landing_url ==
      "https://digitaltmuseum.org/021015456789/fiskebat")
    assert(r.image_url == "https://dms-cf.dimu.org/image/1.jpg")
    assert(r.license == "by-sa" && r.license_version == "4.0")
    assert(r.title == "Fiskebåt")
    assert(r.creator == "Anders Beer Wilse")
    assert(r.description == "A fishing boat.")
    assert(r.article_metadata("identifier") == "NF.1900-01")
    assert(r.article_metadata("type") == "Photograph")
    assert(r.article_metadata("image_alt_text") == "boat at sea")
  }

  test("Science Museum UK: cc badge basename license, fact plucks, " +
      "one row per carousel image (ScienceMuseum.py:53-141)") {
    val html =
      """<meta property="og:url" content="https://collection.sciencemuseumgroup.org.uk/objects/co1" />
        |<meta property="og:title" content="Difference  Engine No. 2" />
        |<meta property="og:description" content="Babbage's calculating engine" />
        |<div class="cite__method"><img src="/images/cc-by-nc-sa.svg" /></div>
        |<dl class="record-top__dl fact-maker"><a href="/people/babbage">Charles Babbage</a></dl>
        |<dl class="record-top__dl fact-Made">Made: 1847-1849 in London</dl>
        |<dl class="record-details"><dt>Object type:</dt><dd>calculating machine</dd></dl>
        |<img class="carousel__image" src="https://coimages.sciencemuseumgroup.org.uk/1.jpg" />
        |<img class="carousel__image" data-flickity-lazyload="https://coimages.sciencemuseumgroup.org.uk/2.jpg" />""".stripMargin
    val out = ScienceMuseumUk.extract("https://page", html)
    assert(out.length == 2)
    val r = out.head
    assert(r.license == "by-nc-sa")
    assert(r.title == "Difference Engine No. 2")
    assert(r.creator == "Charles Babbage")
    assert(r.creator_url == "/people/babbage")
    assert(r.date == "1847-1849" && r.geography == "London")
    assert(r.details("object_type") == "calculating machine")
    assert(r.description == "Babbage's calculating engine")
    assert(out(1).image_url ==
      "https://coimages.sciencemuseumgroup.org.uk/2.jpg")
    // unknown maker is dropped (ScienceMuseum.py:92)
    val unk = ScienceMuseumUk.extract("u",
      html.replace("Charles Babbage", "Unknown"))
    assert(unk.head.creator == "")
  }

  test("CAPL single-image page: /l/ rewrite, size=l landing, en title " +
      "and other-language meta (CAPL.py:42-124)") {
    val html =
      """<div class="singleimage">
        |<a rel="license" href="https://creativecommons.org/licenses/by-nc-sa/3.0/">cc</a>
        |<span class="alternateImages">
        |  <span class="directLink"><a href="https://capl.washjeff.edu/images/m/123.jpg">direct</a></span>
        |</span>
        |<div class="line"><span lang="en">bread</span></div>
        |<div class="line">Description (German): <span lang="de">das Brot</span></div>
        |</div>""".stripMargin
    val out = Capl.extract("https://capl.washjeff.edu/browse?id=1&size=m",
      html)
    assert(out.length == 1)
    val r = out.head
    assert(r.image_url == "https://capl.washjeff.edu/images/l/123.jpg")
    assert(r.thumbnail_url == "https://capl.washjeff.edu/images/m/123.jpg")
    assert(r.foreign_identifier == r.image_url)
    assert(r.foreign_landing_url ==
      "https://capl.washjeff.edu/browse?id=1&size=l")
    assert(r.license == "by-nc-sa" && r.license_version == "3.0")
    assert(r.title == "bread")
    assert(r.creator == Capl.creatorName)
    assert(r.other_titles.keySet.exists(_.contains("german")))
    assert(r.other_titles.values.toSeq.contains("das Brot"))
    // no en title -> no row (CAPL.py:116-118)
    assert(Capl.extract("u", html.replace("lang=\"en\"", "lang=\"fr\""))
      .isEmpty)
  }

  test("Animal Diversity Web: resource img, metadata h3/p pairs minus " +
      "conditions_of_use, :: keyword split, taxa maps " +
      "(AnimalDiversityWeb.py:61-175)") {
    val html =
      """<meta property="og:url" content="https://animaldiversity.org/accounts/Ursus_arctos/" />
        |<meta property="og:title" content="Ursus arctos" />
        |<a rel="license" href="https://creativecommons.org/licenses/by-nc-sa/3.0/">cc</a>
        |<img class="resource" src="/collections/1.jpg" data-width="1200" data-height="800" alt="brown bear" />
        |<section class="metadata">
        |<h3>Photographer</h3><p>J. Doe</p>
        |<h3>Conditions of Use</h3><p>none</p>
        |</section>
        |<ul class="keywords"><li>mammal :: bear :: mammal</li></ul>
        |<div class="classification well"><h3>Classification</h3>
        |<li><span class="rank">genus</span><a class="taxon-name">Ursus</a><span class="vernacular-name">bears</span></li>
        |</div>""".stripMargin
    val out = AnimalDiversity.extract("https://page", html)
    assert(out.isDefined)
    val r = out.get
    assert(r.foreign_landing_url ==
      "https://animaldiversity.org/accounts/Ursus_arctos/")
    assert(r.image_url == "https://animaldiversity.org/collections/1.jpg")
    assert(r.width == "1200" && r.height == "800")
    assert(r.license == "by-nc-sa" && r.license_version == "3.0")
    assert(r.title == "Ursus arctos")
    assert(r.metadata == Map("photographer" -> "J. Doe"))
    assert(r.tags.sorted == Seq("bear", "mammal"))
    assert(r.classification("genus") == "Ursus / bears")
  }

  test("Museums Victoria HTML: single og:image row with creator label " +
      "strip and detail metadata (MuseumVictoria.py:58-148)") {
    val html =
      """<meta property="og:image" content="https://cdn.mv/329745-medium.jpg" />
        |<meta property="og:image:width" content="1500" />
        |<meta property="og:image:height" content="1390" />
        |<meta property="og:title" content="War  Diary" />
        |<span class="licence"><a href="https://creativecommons.org/licenses/by/4.0/">cc</a></span>
        |<div class="creators">Photographer: Deb Tout-Smith</div>
        |<div class="summary"><p>A hand-written diary.</p></div>
        |<div class="detail">
        |<li><h3>Date Made</h3><p>1915</p><p>1916</p></li>
        |<li><h3>Keywords</h3><p>war,diary</p></li>
        |</div>""".stripMargin
    val out = MuseumVictoriaHtml.extract(
      "https://collections.museumvictoria.com.au/items/252670", html)
    assert(out.length == 1)
    val r = out.head
    assert(r.foreign_identifier == "252670")
    assert(r.image_url == "https://cdn.mv/329745-medium.jpg")
    assert(r.thumbnail_url == "https://cdn.mv/329745-thumbnail.jpg")
    assert(r.width == "1500" && r.height == "1390")
    assert(r.license == "by" && r.license_version == "4.0")
    assert(r.title == "War Diary")
    assert(r.creator == "Deb Tout-Smith")
    assert(r.description == "A hand-written diary.")
    assert(r.details("date_made") == "1915,1916")
    assert(r.tags == "war,diary")
  }

  test("Behance: copyright-block license, owner profiles with " +
      "location query parts, one row per module image minus blanks " +
      "(Behance.py:50-190)") {
    val html =
      """<meta property="og:title" content="City  Sketches" />
        |<meta property="og:url" content="https://www.behance.net/gallery/99/city" />
        |<meta property="og:owners" content="Jane Artist" />
        |<meta property="og:description" content="Urban sketching series" />
        |<div id="project-block-copyright">
        |<a href="https://creativecommons.org/licenses/by-nd/4.0/">cc</a></div>
        |<div class="rf-profile-item__info">
        |<a class="rf-profile-item__name js-mini-profile" href="https://www.behance.net/janeartist">Jane  Artist</a>
        |<a class="rf-profile-item__location beicons-pre beicons-pre-location" href="https://www.behance.net/search?country=PT&state=Lisboa&city=Lisbon">Lisbon</a>
        |</div>
        |<a class="object-tag">sketch</a><a class="object-tag">urban</a>
        |<div id="project-modules">
        |<img src="https://mir-cdn.behance.net/1.png" />
        |<img src="https://mir-cdn.behance.net/img/site/blank.png" />
        |<img src="https://mir-cdn.behance.net/2.png" />
        |</div>""".stripMargin
    val out = Behance.extract("https://page", html)
    assert(out.length == 2)
    val r = out.head
    assert(r.license == "by-nd" && r.license_version == "4.0")
    assert(r.title == "City Sketches")
    assert(r.creator == "Jane Artist")
    assert(r.creator_url == "https://www.behance.net/janeartist")
    assert(r.owners.length == 1)
    assert(r.owners.head.location == Map(
      "country" -> "PT", "state" -> "Lisboa", "city" -> "Lisbon"))
    assert(r.tags == "sketch,urban")
    assert(r.description == "Urban sketching series")
    assert(r.set_url == "https://www.behance.net/gallery/99/city")
    assert(out.map(_.image_url) == Seq(
      "https://mir-cdn.behance.net/1.png",
      "https://mir-cdn.behance.net/2.png"))
  }
}
