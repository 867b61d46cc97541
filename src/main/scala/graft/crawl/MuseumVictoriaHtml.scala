package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** Museums Victoria collection-page extraction (providers/
  * commoncrawl/MuseumVictoria.py:29-189), re-specified from output
  * behavior. (Distinct from graft.providers.MuseumVictoria, the v2
  * JSON API script — this is the older crawled-HTML pipeline.)
  *
  * The span.licence anchor resolves the CC license (:58-69);
  * og:image/:width/:height supply the main image with a -medium ->
  * -thumbnail rendition (:73-86); the creators div strips
  * Photographer:/Artist: labels (:93-101); the page URL's trailing
  * number is the required foreign id (:103-109); summary p is the
  * description and detail li h3->p pairs the metadata, with keywords
  * renamed to tags (:120-148). Pages with more than one thumbnail
  * div emit one row PER thumbnail with the -thumbnail -> -medium url
  * as id (:158-185); otherwise the single og:image row.
  */
object MuseumVictoriaHtml {

  val provider = "museumvictoria"
  val defaultDomain = "https://collections.museumvictoria.com.au"

  final case class MvImage(
      foreign_identifier: String,
      foreign_landing_url: String,
      image_url: String,
      thumbnail_url: String,
      width: String,
      height: String,
      license: String,
      license_version: String,
      title: String,
      creator: String,
      description: String,
      details: Map[String, String],
      tags: String,
      image_alt_text: String)

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  private def metaContent(html: String, prop: String): Option[String] =
    s"""<meta\\s+[^>]*property="$prop"[^>]*>""".r.findFirstIn(html)
      .flatMap(attr(_, "content"))

  private def text(html: String): String =
    html.replaceAll("<[^>]*>", "").trim

  def extract(pageUrl: String, html: String,
      domain: String = defaultDomain): Seq[MvImage] = {
    val row = for {
      licBlock <- """(?s)<span[^>]*class="licence"[^>]*>(.*?)</span>""".r
        .findFirstMatchIn(html).map(_.group(1))
      href <- """<a[^>]*href="([^"]+)"""".r.findFirstMatchIn(licBlock)
        .map(_.group(1))
      (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
      lic <- licOpt
      img <- metaContent(html, "og:image")
      fid <- Eol.foreignId(pageUrl)
    } yield {
      val creator =
        """(?s)<div[^>]*class="creators"[^>]*>(.*?)</div>""".r
          .findFirstMatchIn(html).map(m => sanitize(text(m.group(1))))
          .map {
            case c if c.contains("Photographer") =>
              c.replace("Photographer:", "").trim
            case c if c.contains("Artist") => c.replace("Artist:", "").trim
            case _ => ""
          }.getOrElse("")
      val description =
        """(?s)<div[^>]*class="summary"[^>]*>(.*?)</div>""".r
          .findFirstMatchIn(html).flatMap(b =>
            """(?s)<p[^>]*>(.*?)</p>""".r.findFirstMatchIn(b.group(1))
              .map(m => sanitize(text(m.group(1)))))
          .getOrElse("")
      val details: Map[String, String] = {
        val block = """(?s)<div[^>]*class="detail"[^>]*>(.*)""".r
          .findFirstMatchIn(html).map(_.group(1)).getOrElse("")
        """(?s)<li[^>]*>(.*?)</li>""".r.findAllMatchIn(block).flatMap { li =>
          """(?s)<h3[^>]*>(.*?)</h3>""".r.findFirstMatchIn(li.group(1))
            .map { h =>
              val lbl = text(h.group(1)).replaceAll("\\s", "_").toLowerCase
              val vals = """(?s)<p[^>]*>(.*?)</p>""".r
                .findAllMatchIn(li.group(1))
                .map(m => text(m.group(1)).replaceAll("\\s+", " ")).toSeq
              lbl -> vals.mkString(",")
            }
        }.toMap
      }
      val tags = details.getOrElse("keywords", "")
      val mainRow = MvImage(
        foreign_identifier = fid,
        foreign_landing_url = pageUrl,
        image_url = img,
        thumbnail_url =
          if (img.contains("-medium.")) img.replace("-medium", "-thumbnail")
          else "",
        width = metaContent(html, "og:image:width").getOrElse(""),
        height = metaContent(html, "og:image:height").getOrElse(""),
        license = lic,
        license_version = verOpt.getOrElse(""),
        title = metaContent(html, "og:title").map(sanitize).getOrElse(""),
        creator = creator,
        description = description,
        details = (details - "keywords"),
        tags = tags,
        image_alt_text = "")
      val thumbs = """<div[^>]*class="thumbnail"[^>]*>""".r
        .findAllMatchIn(html).map(m =>
          """(?s)<img[^>]*>""".r
            .findFirstIn(html.substring(m.end,
              math.min(html.length, m.end + 500)))).toSeq
      if (thumbs.length > 1) {
        thumbs.flatMap(_.flatMap { imgTag =>
          attr(imgTag, "src").map { src =>
            val thumbUrl = s"${domain.stripSuffix("%")}$src"
            val url = thumbUrl.replace("-thumbnail", "-medium")
            mainRow.copy(
              foreign_identifier = url,
              image_url = url,
              thumbnail_url = thumbUrl,
              width = "", height = "",
              image_alt_text = attr(imgTag, "alt").getOrElse(""))
          }
        })
      } else Seq(mainRow)
    }
    row.getOrElse(Nil)
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[MvImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
