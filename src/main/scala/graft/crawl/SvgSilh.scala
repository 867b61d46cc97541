package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** SVG Silh card-gallery extraction (providers/commoncrawl/
  * SVGSilh.py:14-111), re-specified from its output behavior.
  *
  * One row per `div.card` block whose rel="license" anchor resolves
  * to CC0 (:53-67). The page-level og:image supplies the CDN domain
  * (everything before '/png', :71-74); the card's img src becomes the
  * PNG image URL via the svg->png swap (:76-78) and the raw svg path
  * is kept in meta (:90); the landing URL is the /image/NNN.html card
  * link (:84-87); tags are the anchor texts inside the dct:title
  * paragraph (:93-97); the title is og:description up to ' - ' and
  * before any '(' (:99-102).
  */
object SvgSilh {

  val provider = "svgsilh"

  final case class SvgImage(
      foreign_landing_url: String,
      image_url: String,
      svg_url: String,
      license: String,
      license_version: String,
      title: String,
      tags: Seq[String])

  private def metaContent(html: String, prop: String): Option[String] =
    s"""<meta\\s+[^>]*property="$prop"[^>]*>""".r
      .findFirstIn(html)
      .flatMap(m => """content="([^"]*)"""".r.findFirstMatchIn(m)
        .map(_.group(1)))

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  def extract(pageUrl: String, html: String): Seq[SvgImage] = {
    val domain = metaContent(html, "og:image").map(_.split("/png")(0))
      .getOrElse(return Nil)
    if (!domain.toLowerCase.contains(provider)) return Nil
    val title = metaContent(html, "og:description")
      .map(d => sanitize(d.split(" - ")(0).split("\\(")(0)))
      .getOrElse("")
    val blocks = html
      .split("""<div[^>]*class="card mb-3 box-shadow h-100"[^>]*>""")
      .drop(1)
    blocks.toSeq.flatMap { block =>
      for {
        licHref <- """(?s)<a[^>]*rel="license"[^>]*href="([^"]+)"|<a[^>]*href="([^"]+)"[^>]*rel="license"""".r
          .findFirstMatchIn(block)
          .map(m => Option(m.group(1)).getOrElse(m.group(2)))
        (licOpt, verOpt, _) = Licenses.infoFromUrl(licHref.trim)
        lic <- licOpt
        if lic.toLowerCase == "cc0"
        src <- """<img[^>]*src="([^"]+)"""".r.findFirstMatchIn(block)
          .map(_.group(1))
        landingPath <- """href="(/image/\d+\.html)"""".r
          .findFirstMatchIn(block).map(_.group(1))
      } yield {
        val tags =
          """(?s)<p[^>]*property="dct:title"[^>]*>(.*?)</p>""".r
            .findFirstMatchIn(block)
            .map(p => """(?s)<a[^>]*>(.*?)</a>""".r
              .findAllMatchIn(p.group(1))
              .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")))
              .filter(_.nonEmpty).toSeq)
            .getOrElse(Nil)
        SvgImage(
          foreign_landing_url = s"$domain$landingPath",
          image_url = s"$domain${src.replace("svg", "png")}",
          svg_url = s"$domain$src",
          license = lic,
          license_version = verOpt.getOrElse(""),
          title = title,
          tags = tags)
      }
    }
  }

  /** Distributed application: typed flatMap. */
  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[SvgImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
