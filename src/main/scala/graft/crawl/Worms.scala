package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** World Register of Marine Species (WoRMS) photogallery extraction
  * (providers/commoncrawl/WoRMS.py:14-156), re-specified from output
  * behavior.
  *
  * Only `p=image` detail pages yield a row (taxdetails pages carry no
  * verifiable license, :151-156). The share div's data-url is the
  * landing URL and its `pic` query param the foreign id (:46-57); the
  * resized-img div must carry an itemprop=license meta resolving to
  * CC (:62-77); the img child supplies src/width/height/title with
  * int-cast dims defaulting to '0' on parse failure (:81-111) and a
  * resized -> thumbs thumbnail (:92); description and author come
  * from the photogallery caption spans (:120-138).
  */
object Worms {

  val provider = "worms"

  final case class WormsImage(
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
      creator_url: String,
      description: String)

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  private def intDim(s: Option[String]): Int =
    s.flatMap(v => scala.util.Try(v.trim.toDouble.toInt).toOption)
      .getOrElse(0)

  private def divBlock(html: String, id: String): Option[String] =
    s"""(?s)<div[^>]*id="$id"[^>]*>(.*?)</div>""".r
      .findFirstMatchIn(html).map(_.group(1))

  /** Balanced <span> subtree: from the first span whose class matches
    * `clazz` to its OWN closing tag (depth-counted), so nested caption
    * spans stay inside the block. */
  private def spanBlock(html: String, clazz: String): Option[String] = {
    val open = s"""<span[^>]*class="$clazz"[^>]*>""".r
    open.findFirstMatchIn(html).map { m =>
      val rest = html.substring(m.end)
      val tag = """(?s)<span\b|</span>""".r
      var depth = 1
      var endAt = rest.length
      val it = tag.findAllMatchIn(rest)
      while (depth > 0 && it.hasNext) {
        val t = it.next()
        depth += (if (t.matched.startsWith("</")) -1 else 1)
        if (depth == 0) endAt = t.start
      }
      rest.substring(0, endAt)
    }
  }

  def extract(pageUrl: String, html: String): Option[WormsImage] = {
    if (!pageUrl.contains("p=image")) return None
    val share = """<div[^>]*id="photogallery_share"[^>]*>""".r
      .findFirstIn(html)
    val landing = share.flatMap(attr(_, "data-url"))
    val fid = landing.flatMap(u =>
      """[?&]pic=([^&]+)""".r.findFirstMatchIn(u).map(_.group(1)))
    for {
      resized <- divBlock(html, "photogallery_resized_img")
      licMeta <- """<meta[^>]*itemprop="license"[^>]*>""".r
        .findFirstIn(resized)
      content <- attr(licMeta, "content")
      (licOpt, verOpt, _) = Licenses.infoFromUrl(content.trim)
      lic <- licOpt
      imgTag <- """<img[^>]*>""".r.findFirstIn(resized)
      src <- attr(imgTag, "src")
    } yield {
      val desc =
        spanBlock(html, "photogallery_caption photogallery_descr")
          .flatMap(block =>
            """(?s)<span[^>]*class="photogallery_caption photogallery_text"[^>]*>(.*?)</span>""".r
              .findFirstMatchIn(block)
              .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", ""))))
          .filter(_.nonEmpty)
      val authorBlock =
        spanBlock(html, "photogallery_caption photogallery_author")
      val authorA = authorBlock.flatMap(b =>
        """(?s)<a[^>]*href="([^"]+)"[^>]*>(.*?)</a>""".r.findFirstMatchIn(b))
      val creator = authorA.map(m => sanitize(m.group(2)))
        .orElse(authorBlock.flatMap(b =>
          """(?s)<span[^>]*class="photogallery_caption photogallery_text"[^>]*>(.*?)</span>""".r
            .findFirstMatchIn(b)
            .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")))
            .filter(_.nonEmpty)))
        .getOrElse("")
      WormsImage(
        foreign_identifier = fid.getOrElse(""),
        foreign_landing_url = landing.getOrElse(pageUrl),
        image_url = src,
        thumbnail_url = src.replace("resized", "thumbs"),
        width = intDim(attr(imgTag, "width")),
        height = intDim(attr(imgTag, "height")),
        license = lic,
        license_version = verOpt.getOrElse(""),
        title = attr(imgTag, "title").map(sanitize).getOrElse(""),
        creator = creator,
        creator_url = authorA.map(_.group(1).trim).getOrElse(""),
        description = desc.getOrElse(""))
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[WormsImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
