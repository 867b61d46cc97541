package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** DeviantArt artwork-page extraction (providers/commoncrawl/
  * DeviantArt.py:20-116), re-specified from its output behavior.
  *
  * One page yields at most one row: a rel="license" anchor must
  * resolve to a known CC license (:48-58), the og:image is the image
  * (the card_black_large.png placeholder means no image, :62-67) with
  * og:image:width/height dims, creator name+URL come from the
  * username anchor inside `small.author` (:84-89), a non-blank
  * `div.text block` is the description (:93-95), landing URL is
  * og:url (:98), and the gmi-deviationid attribute of the dev-page
  * view div is the required foreign id (:100-105).
  */
object DeviantArt {

  final case class DeviantImage(
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
      description: String)

  private def metaContent(html: String, prop: String): Option[String] =
    s"""<meta\\s+[^>]*property="$prop"[^>]*>""".r
      .findFirstIn(html)
      .flatMap(m => """content="([^"]*)"""".r.findFirstMatchIn(m)
        .map(_.group(1)))

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  def extract(pageUrl: String, html: String): Option[DeviantImage] = {
    val licHref =
      """(?s)<a[^>]*rel="license"[^>]*href="([^"]+)"[^>]*>|<a[^>]*href="([^"]+)"[^>]*rel="license"[^>]*>""".r
        .findFirstMatchIn(html)
        .map(m => Option(m.group(1)).getOrElse(m.group(2)))
    for {
      href <- licHref
      (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
      lic <- licOpt
      img <- metaContent(html, "og:image")
      if !img.contains("main/logo/card_black_large.png")
      fid <- """(?s)<div[^>]*class="dev-page-view view-mode-normal"[^>]*gmi-deviationid="([^"]+)"""".r
        .findFirstMatchIn(html).map(_.group(1).trim)
    } yield {
      val creatorBlock =
        """(?s)<small[^>]*class="author"[^>]*>(.*?)</small>""".r
          .findFirstMatchIn(html).map(_.group(1))
      val creatorA = creatorBlock.flatMap(b =>
        """(?s)<a[^>]*class="[^"]*username"[^>]*href="([^"]+)"[^>]*>(.*?)</a>""".r
          .findFirstMatchIn(b))
      val desc =
        """(?s)<div[^>]*class="text block"[^>]*>(.*?)</div>""".r
          .findFirstMatchIn(html)
          .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")))
          .filter(_.nonEmpty)
      DeviantImage(
        foreign_identifier = fid,
        foreign_landing_url = metaContent(html, "og:url").getOrElse(pageUrl),
        image_url = img,
        width = metaContent(html, "og:image:width").getOrElse(""),
        height = metaContent(html, "og:image:height").getOrElse(""),
        license = lic,
        license_version = verOpt.getOrElse(""),
        title = metaContent(html, "og:title").map(sanitize).getOrElse(""),
        creator = creatorA
          .map(m => sanitize(m.group(2).replaceAll("<[^>]*>", "")))
          .getOrElse(""),
        creator_url = creatorA.map(_.group(1).trim).getOrElse(""),
        description = desc.getOrElse(""))
    }
  }

  /** Distributed application: typed flatMap, one Generator-shaped
    * operator, no driver loop. */
  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[DeviantImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
