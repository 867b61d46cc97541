package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** Thorvaldsens Museum extraction (providers/commoncrawl/
  * ThorvaldsensMuseum.py:14-93), re-specified from output behavior.
  *
  * One page yields at most one row: the rel="license" anchor must
  * resolve to a CC license and its `about` attribute IS the image URL
  * (:47-66); the thumbnail is the /large/ -> /small/ rendition
  * (:69); dimensions and title come from the img tag whose src
  * matches the image (:72-76); landing URL is the page itself (:84);
  * creator name is the artists div's leading text with the
  * a.standard child as the creator URL (:87-90).
  */
object Thorvaldsens {

  val provider = "thorvaldsensmuseum"

  final case class ThorvaldsensImage(
      foreign_landing_url: String,
      image_url: String,
      thumbnail_url: String,
      width: String,
      height: String,
      license: String,
      license_version: String,
      title: String,
      creator: String,
      creator_url: String)

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  def extract(pageUrl: String, html: String): Option[ThorvaldsensImage] = {
    val licTag = """<a[^>]*rel="license"[^>]*>""".r.findFirstIn(html)
    for {
      tag <- licTag
      href <- attr(tag, "href")
      (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
      lic <- licOpt
      img <- attr(tag, "about").filter(_.nonEmpty)
    } yield {
      val imgTag = s"""<img[^>]*src="${java.util.regex.Pattern.quote(img)}"[^>]*>""".r
        .findFirstIn(html)
      val artists =
        """(?s)<div[^>]*class="artists"[^>]*>(.*?)</div>""".r
          .findFirstMatchIn(html).map(_.group(1))
      // contents[0]: the text before the first child element
      val creator = artists
        .map(a => sanitize(a.takeWhile(_ != '<')))
        .getOrElse("")
      val creatorUrl = artists.flatMap(a =>
        """<a[^>]*class="standard"[^>]*href="([^"]+)"|<a[^>]*href="([^"]+)"[^>]*class="standard"""".r
          .findFirstMatchIn(a)
          .map(m => Option(m.group(1)).getOrElse(m.group(2))))
        .getOrElse("")
      ThorvaldsensImage(
        foreign_landing_url = pageUrl,
        image_url = img,
        thumbnail_url = img.replace("/large/", "/small/"),
        width = imgTag.flatMap(attr(_, "width")).getOrElse(""),
        height = imgTag.flatMap(attr(_, "height")).getOrElse(""),
        license = lic,
        license_version = verOpt.getOrElse(""),
        title = imgTag.flatMap(attr(_, "alt")).map(sanitize).getOrElse(""),
        creator = creator,
        creator_url = creatorUrl)
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[ThorvaldsensImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
