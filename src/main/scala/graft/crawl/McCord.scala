package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** McCord Museum extraction (providers/commoncrawl/
  * McCordMuseum.py:31-163), re-specified from output behavior.
  *
  * One page yields at most one row: rel="license" anchor resolves the
  * CC license (:62-72); div.image img supplies a domain-prefixed src,
  * int-cast dims ('0' on failure), an ObjView -> ListView thumbnail,
  * and alt text (:75-106); the `h1.vo` text splits on '|' into
  * foreign id | title (:117-127, id required); 'All tagged images'
  * anchors join as tags (:131-135); the artist anchor inside the
  * etiquette div (name before ' (') is the creator (:138-143); the
  * descriptions div is the description (:147-151). Watermarked.
  */
object McCord {

  val provider = "mccordmuseum"
  val defaultDomain = "http://collections.musee-mccord.qc.ca"

  final case class McCordImage(
      foreign_identifier: String,
      foreign_landing_url: String,
      image_url: String,
      thumbnail_url: String,
      width: Int,
      height: Int,
      license: String,
      license_version: String,
      title: String,
      creator: String,
      image_alt_text: String,
      tags: String,
      description: String,
      watermarked: String)

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  private def intDim(s: Option[String]): Int =
    s.flatMap(v => scala.util.Try(v.trim.toDouble.toInt).toOption)
      .getOrElse(0)

  def extract(pageUrl: String, html: String,
      domain: String = defaultDomain): Option[McCordImage] = {
    for {
      licTag <- """<a[^>]*rel="license"[^>]*>""".r.findFirstIn(html)
      href <- attr(licTag, "href")
      (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
      lic <- licOpt
      imgBlock <- """(?s)<div[^>]*class="image"[^>]*>(.*?)</div>""".r
        .findFirstMatchIn(html).map(_.group(1))
      imgTag <- """<img[^>]*>""".r.findFirstIn(imgBlock)
      src <- attr(imgTag, "src").filter(_.nonEmpty)
      h1 <- """(?s)<h1[^>]*class="vo"[^>]*>(.*?)</h1>""".r
        .findFirstMatchIn(html)
        .map(_.group(1).replaceAll("<[^>]*>", ""))
      parts = h1.split("\\|")
      if parts.length >= 2 && parts(0).trim.nonEmpty
    } yield {
      val url = s"${domain.stripSuffix("%")}$src"
      val tags =
        """(?s)<a[^>]*title="All tagged images"[^>]*>(.*?)</a>""".r
          .findAllMatchIn(html)
          .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")))
          .filter(_.nonEmpty).mkString(",")
      val creator =
        """(?s)<div[^>]*id="etiquette"[^>]*>(.*?)</div>""".r
          .findFirstMatchIn(html).map(_.group(1)).flatMap(b =>
            """(?s)<a[^>]*href="[^"]*tablename=artist[^"]*"[^>]*>(.*?)</a>""".r
              .findFirstMatchIn(b)
              .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")
                .split(" \\(")(0))))
          .getOrElse("")
      val description =
        """(?s)<div[^>]*id="descriptions"[^>]*>(.*?)</div>""".r
          .findFirstMatchIn(html)
          .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")))
          .filter(_.nonEmpty).getOrElse("")
      McCordImage(
        foreign_identifier = parts(0).trim,
        foreign_landing_url = pageUrl,
        image_url = url,
        thumbnail_url = url.replace("/ObjView/", "/ListView/"),
        width = intDim(attr(imgTag, "width")),
        height = intDim(attr(imgTag, "height")),
        license = lic,
        license_version = verOpt.getOrElse(""),
        title = sanitize(parts(1)),
        creator = creator,
        image_alt_text = attr(imgTag, "alt").map(sanitize).getOrElse(""),
        tags = tags,
        description = description,
        watermarked = "t")
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[McCordImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
