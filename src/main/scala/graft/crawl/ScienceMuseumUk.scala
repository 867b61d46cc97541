package graft.crawl

import org.apache.spark.sql.Dataset

/** Science Museum UK page extraction (providers/commoncrawl/
  * ScienceMuseum.py:21-144), re-specified from output behavior.
  *
  * The license is the basename of the cite__method badge image (cc-
  * prefix stripped, lowercased; :53-65, no version on these pages).
  * og:url/og:title/og:description supply landing, title and
  * description (:68-82); the fact-maker dl's anchor is the creator
  * unless 'unknown' (:86-96); the fact-Made dl splits on 'in' into
  * date/geography (:100-105); record-details dls become dt->dd
  * metadata (:108-115); one row per carousel__image (single_image
  * fallback) img, src or data-flickity-lazyload (:118-141).
  */
object ScienceMuseumUk {

  val provider = "sciencemuseum"

  final case class ScienceMuseumImage(
      foreign_landing_url: String,
      image_url: String,
      license: String,
      title: String,
      creator: String,
      creator_url: String,
      date: String,
      geography: String,
      details: Map[String, String],
      description: String)

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  private def metaContent(html: String, prop: String): Option[String] =
    s"""<meta\\s+[^>]*property="$prop"[^>]*>""".r.findFirstIn(html)
      .flatMap(attr(_, "content"))

  private def text(html: String): String = html.replaceAll("<[^>]*>", "")

  def extract(pageUrl: String, html: String): Seq[ScienceMuseumImage] = {
    val license = for {
      cite <- """(?s)<div[^>]*class="cite__method"[^>]*>(.*?)</div>""".r
        .findFirstMatchIn(html).map(_.group(1))
      imgTag <- """<img[^>]*>""".r.findFirstIn(cite)
      src <- attr(imgTag, "src")
      base = src.split("/").last.split("\\.")(0)
    } yield base.replaceFirst("^cc-", "").toLowerCase
    val lic = license.getOrElse(return Nil)
    if (lic.isEmpty) return Nil

    val maker =
      """(?s)<dl[^>]*class="record-top__dl fact-maker"[^>]*>(.*?)</dl>""".r
        .findFirstMatchIn(html).flatMap(b =>
          """(?s)<a([^>]*)>(.*?)</a>""".r.findFirstMatchIn(b.group(1)))
    val makerName = maker.map(m => sanitize(text(m.group(2))))
      .filter(_.toLowerCase != "unknown")
    val made =
      """(?s)<dl[^>]*class="record-top__dl fact-Made"[^>]*>(.*?)</dl>""".r
        .findFirstMatchIn(html)
        .map(m => text(m.group(1)).replace("Made:", "").replace("Maker:", ""))
        .map(_.split("in", 2))
        .filter(_.length > 1)
    val details =
      """(?s)<dl[^>]*class="record-details[^"]*"[^>]*>(.*?)</dl>""".r
        .findAllMatchIn(html).flatMap { d =>
          for {
            dt <- """(?s)<dt[^>]*>(.*?)</dt>""".r.findFirstMatchIn(d.group(1))
            dd <- """(?s)<dd[^>]*>(.*?)</dd>""".r.findFirstMatchIn(d.group(1))
          } yield (text(dt.group(1)).trim.toLowerCase.replace(" ", "_")
            .stripSuffix(":"), sanitize(text(dd.group(1))))
        }.toMap

    val carousel = """<img[^>]*class="carousel__image"[^>]*>""".r
      .findAllIn(html).toSeq
    val records =
      if (carousel.nonEmpty) carousel
      else """<img[^>]*class="single_image"[^>]*>""".r.findAllIn(html).toSeq

    records.flatMap { imgTag =>
      attr(imgTag, "src").map(_.trim).filter(_.nonEmpty)
        .orElse(attr(imgTag, "data-flickity-lazyload").map(_.trim)
          .filter(_.nonEmpty))
        .map { src =>
          ScienceMuseumImage(
            foreign_landing_url =
              metaContent(html, "og:url").getOrElse(pageUrl),
            image_url = src,
            license = lic,
            title = metaContent(html, "og:title").map(sanitize)
              .getOrElse(""),
            creator = makerName.getOrElse(""),
            creator_url = makerName.flatMap(_ =>
              maker.flatMap(m => attr(m.group(1), "href"))).getOrElse(""),
            date = made.map(m => m(0).trim).getOrElse(""),
            geography = made.map(m => m(1).trim).getOrElse(""),
            details = details,
            description = metaContent(html, "og:description").map(sanitize)
              .getOrElse(""))
        }
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[ScienceMuseumImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
