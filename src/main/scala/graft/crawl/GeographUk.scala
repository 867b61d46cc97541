package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** Geograph UK extraction (providers/commoncrawl/
  * GeographOrgUK.py:22-139), re-specified from output behavior.
  *
  * One page yields at most one row: rel="license" anchor resolves the
  * CC license (:50-60); the mainphoto div's img supplies
  * src/width/height (:63-76); title from the dct:title strong
  * (:80-82); creator from the rel="author" anchor with a
  * domain-prefixed URL (:86-89); span.tag texts joined as tags
  * (:93-96); latitude/longitude abbr titles, exifData date and
  * itemprop=description caption fill the metadata (:100-116); the
  * canonical link is the landing URL whose trailing number is the
  * required foreign id (:119-127, Provider.py:171-178).
  */
object GeographUk {

  val provider = "geographorguk"
  val defaultDomain = "https://www.geograph.org.uk"

  final case class GeographImage(
      foreign_identifier: String,
      foreign_landing_url: String,
      image_url: String,
      width: String,
      height: String,
      license: String,
      license_version: String,
      title: String,
      creator: String,
      creator_url: String,
      tags: Seq[String],
      latitude: String,
      longitude: String,
      date_taken: String,
      description: String)

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  private def tagText(html: String, re: scala.util.matching.Regex)
      : Option[String] =
    re.findFirstMatchIn(html)
      .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")))
      .filter(_.nonEmpty)

  def extract(pageUrl: String, html: String,
      domain: String = defaultDomain): Option[GeographImage] = {
    for {
      licTag <- """<a[^>]*rel="license"[^>]*>""".r.findFirstIn(html)
      href <- attr(licTag, "href")
      (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
      lic <- licOpt
      main <- """(?s)<div[^>]*id="mainphoto"[^>]*>(.*?)</div>""".r
        .findFirstMatchIn(html).map(_.group(1))
      imgTag <- """<img[^>]*>""".r.findFirstIn(main)
      landing = """<link[^>]*rel="canonical"[^>]*href="([^"]+)"|<link[^>]*href="([^"]+)"[^>]*rel="canonical"""".r
        .findFirstMatchIn(html)
        .map(m => Option(m.group(1)).getOrElse(m.group(2)))
        .getOrElse(pageUrl)
      fid <- Eol.foreignId(landing)
    } yield {
      val authorA =
        """(?s)<a[^>]*rel="author"[^>]*href="([^"]+)"[^>]*>(.*?)</a>|(?s)<a[^>]*href="([^"]+)"[^>]*rel="author"[^>]*>(.*?)</a>""".r
          .findFirstMatchIn(html)
          .map(m => (Option(m.group(1)).getOrElse(m.group(3)),
            Option(m.group(2)).getOrElse(m.group(4))))
      val tags =
        """(?s)<span[^>]*class="tag"[^>]*>(.*?)</span>""".r
          .findAllMatchIn(html)
          .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")))
          .filter(_.nonEmpty).toSeq
      def abbrTitle(clazz: String): String =
        s"""<abbr[^>]*class="$clazz"[^>]*>""".r.findFirstIn(html)
          .flatMap(attr(_, "title")).getOrElse("")
      GeographImage(
        foreign_identifier = fid.trim,
        foreign_landing_url = landing,
        image_url = attr(imgTag, "src").getOrElse(""),
        width = attr(imgTag, "width").getOrElse(""),
        height = attr(imgTag, "height").getOrElse(""),
        license = lic,
        license_version = verOpt.getOrElse(""),
        title = tagText(html,
          """(?s)<strong[^>]*property="dct:title"[^>]*>(.*?)</strong>""".r)
          .getOrElse(""),
        creator = authorA.map(a => sanitize(a._2.replaceAll("<[^>]*>", "")))
          .getOrElse(""),
        creator_url = authorA.map(a => s"${domain.stripSuffix("%")}${a._1}")
          .getOrElse(""),
        tags = tags,
        latitude = abbrTitle("latitude"),
        longitude = abbrTitle("longitude"),
        date_taken = tagText(html,
          """(?s)<span[^>]*itemprop="exifData"[^>]*>(.*?)</span>""".r)
          .getOrElse(""),
        description = tagText(html,
          """(?s)<div[^>]*itemprop="description"[^>]*>(.*?)</div>""".r)
          .getOrElse(""))
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[GeographImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
