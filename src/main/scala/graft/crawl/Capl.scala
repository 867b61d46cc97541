package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** CAPL (Culturally Authentic Pictorial Lexicon) extraction
  * (providers/commoncrawl/CAPL.py:14-207), re-specified from output
  * behavior.
  *
  * Detail pages (`div.singleimage`): the direct-link anchor's href
  * with /m/ or /s/ rewritten to /l/ is the image (and the foreign
  * id), the /m/ rendition the thumbnail (:65-96); the landing URL is
  * the page URL with size=m|s rewritten to size=l (:93); the `lang=
  * "en"` line is the title (required, :103-118) and other-language
  * lines land in metadata keyed by their label; the creator is the
  * collection's fixed author (:99). Result pages (`div.light|dark
  * item`): same per-item, with the lightbox anchor and the 'l'
  * imgTxt link (:128-204).
  */
object Capl {

  val provider = "capl"
  val creatorName = "Michael R. Shaughnessy"
  val defaultDomain = "https://capl.washjeff.edu"

  final case class CaplImage(
      foreign_identifier: String,
      foreign_landing_url: String,
      image_url: String,
      thumbnail_url: String,
      license: String,
      license_version: String,
      title: String,
      creator: String,
      other_titles: Map[String, String])

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  private def toLarge(u: String): String =
    u.replaceAll("(/m/)|(/s/)", "/l/")

  /** div.line spans: the en line is the title; other langs map to
    * metadata keys from the label before ':'. */
  private def lines(block: String, keySuffix: Boolean)
      : (String, Map[String, String]) = {
    var title = ""
    val meta = scala.collection.mutable.LinkedHashMap.empty[String, String]
    """(?s)<div[^>]*class="line"[^>]*>(.*?)</div>""".r
      .findAllMatchIn(block).foreach { line =>
        val spanTag = """<span[^>]*>""".r.findFirstIn(line.group(1))
        val spanText =
          """(?s)<span[^>]*>(.*?)</span>""".r.findFirstMatchIn(line.group(1))
            .map(m => m.group(1).replaceAll("<[^>]*>", "")).getOrElse("")
        val lang = spanTag.flatMap(attr(_, "lang")).getOrElse("")
        if (lang == "en") title = sanitize(spanText)
        else {
          val label = line.group(1).replaceAll("<[^>]*>", "")
            .split(":")(0)
          val key0 =
            (if (keySuffix) label.replace("Description", "")
             else label.replace("Description", "title"))
              .toLowerCase.trim
              .replaceAll("\\s+", "_")
              .replace("(", "").replace(")", "")
          val key = if (keySuffix) s"${key0}_title" else key0
          meta(key) = sanitize(spanText)
        }
      }
    (title, meta.toMap)
  }

  def extract(pageUrl: String, html: String,
      domain: String = defaultDomain): Seq[CaplImage] = {
    val single = """(?s)<div[^>]*class="singleimage"[^>]*>(.*)""".r
      .findFirstMatchIn(html).map(_.group(1))
    single match {
      case Some(block) => extractSingle(pageUrl, block).toSeq
      case None => extractList(pageUrl, html, domain)
    }
  }

  /** CAPL.py:42-124 — the size=l detail page. */
  private def extractSingle(pageUrl: String, block: String)
      : Option[CaplImage] = {
    for {
      licTag <- """<a[^>]*rel="license"[^>]*>""".r.findFirstIn(block)
      href <- attr(licTag, "href")
      (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
      lic <- licOpt
      alt <- """(?s)<span[^>]*class="alternateImages"[^>]*>(.*)""".r
        .findFirstMatchIn(block).map(_.group(1))
      direct <- """(?s)<span[^>]*class="directLink"[^>]*>(.*?)</span>""".r
        .findFirstMatchIn(alt).map(_.group(1))
      aHref <- """<a[^>]*href="([^"]+)"""".r.findFirstMatchIn(direct)
        .map(_.group(1))
      (title, meta) = lines(block, keySuffix = false)
      if title.nonEmpty
    } yield {
      val url = toLarge(aHref)
      CaplImage(
        foreign_identifier = url,
        foreign_landing_url =
          pageUrl.replaceAll("(size=m)|(size=s)", "size=l").trim,
        image_url = url,
        thumbnail_url = url.replace("/l/", "/m/"),
        license = lic,
        license_version = verOpt.getOrElse(""),
        title = title,
        creator = creatorName,
        other_titles = meta)
    }
  }

  /** CAPL.py:128-204 — the search-results page. */
  private def extractList(pageUrl: String, html: String, domain: String)
      : Seq[CaplImage] = {
    val items = html
      .split("""<div[^>]*class="(?:light|dark) item"[^>]*>""").toSeq.drop(1)
    items.flatMap { item =>
      for {
        imageDiv <- """(?s)<div[^>]*class="image"[^>]*>(.*)""".r
          .findFirstMatchIn(item).map(_.group(1))
        licTag <- """<a[^>]*rel="license"[^>]*>""".r.findFirstIn(imageDiv)
        href <- attr(licTag, "href")
        (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
        lic <- licOpt
        lightbox <- """<a[^>]*data-rel="lightbox\[results\]"[^>]*>""".r
          .findFirstIn(imageDiv)
        lbHref <- attr(lightbox, "href")
        (title, meta) = lines(item, keySuffix = true)
        if title.nonEmpty
      } yield {
        val url = s"$domain/${toLarge(lbHref)}"
        val landing =
          """(?s)<span[^>]*class="imgTxt"[^>]*>(.*?)</span>""".r
            .findFirstMatchIn(imageDiv).flatMap { t =>
              """(?s)<a[^>]*href="([^"]+)"[^>]*>(.*?)</a>""".r
                .findAllMatchIn(t.group(1))
                .find(m => m.group(2).replaceAll("<[^>]*>", "")
                  .trim.toLowerCase == "l")
                .map(m => s"$domain/${m.group(1)}")
            }.getOrElse("")
        CaplImage(
          foreign_identifier = url,
          foreign_landing_url = landing,
          image_url = url,
          thumbnail_url = url.replace("/l/", "/m/"),
          license = lic,
          license_version = verOpt.getOrElse(""),
          title = title,
          creator = creatorName,
          other_titles = meta)
      }
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[CaplImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
