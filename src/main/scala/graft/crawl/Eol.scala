package graft.crawl

import org.apache.spark.sql.Dataset

/** Encyclopedia of Life (EOL) gallery extraction — the reference's
  * largest CommonCrawl HTML extractor (providers/commoncrawl/
  * EOL.py:28-296), re-specified from its output behavior.
  *
  * Two page shapes:
  *   - `/data_objects/` detail pages yield ONE row: og:url is the
  *     landing URL (its trailing numeric segment is the foreign id,
  *     Provider.py:171-178), the image is the first link inside
  *     `div.media`, the license link lives in `div.article source`,
  *     and credits (rights holder / creator) come from the source
  *     block's labeled paragraphs (EOL.py:100-170).
  *   - taxon pages yield one row PER `div.image` block in
  *     `div.images`: landing URL is the page itself, the foreign id is
  *     the block link's trailing number, thumbnail/src/alt come from
  *     the img attrs, the per-image license from the attribution
  *     block (EOL.py:192-288). Per-image fields reset per block — the
  *     reference's partial-state carryover across blocks is a
  *     documented bug we do NOT reproduce (SURVEY §7.4.8).
  *
  * Page-level keywords land in tags; og:title is trimmed at ' - '
  * (EOL.py:68-70).
  */
object Eol {

  final case class EolImage(
      foreign_identifier: String,
      foreign_landing_url: String,
      image_url: String,
      thumbnail_url: String,
      license_path: String,
      title: String,
      creator: String,
      rights_holder: String,
      tags: Seq[String])

  private val metaRe =
    """<meta\s+[^>]*>""".r
  private def metaAttr(html: String, key: String, keyVal: String)
      : Option[String] =
    metaRe.findAllIn(html).toSeq.collectFirst {
      case m if m.contains(s"""$key="$keyVal"""") =>
        """content="([^"]*)"""".r.findFirstMatchIn(m).map(_.group(1))
    }.flatten

  /** Provider.getForeignID (Provider.py:171-178): trailing numeric
    * path segment. */
  def foreignId(s: String): Option[String] =
    """.*?/(\d+)/?$""".r.findFirstMatchIn(s).map(_.group(1))

  private val ccHrefRe =
    """href="https?://creativecommons\.org(/[^"]+)"""".r

  private def divBlock(html: String, clazz: String): Option[String] = {
    // first div with the class; scope runs to the next top-level-ish
    // div of the same pattern or end of input (regex approximation of
    // the soup's subtree walk — adequate for EOL's flat markup)
    val re = s"""(?s)<div[^>]*class="$clazz"[^>]*>(.*?)(?=<div[^>]*class="(?!$clazz)[a-z]|\\z)""".r
    re.findFirstMatchIn(html).map(_.group(1))
  }

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  def extract(pageUrl: String, html: String): Seq[EolImage] = {
    val tags = metaAttr(html, "name", "keywords")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val title = metaAttr(html, "property", "og:title")
      .map(t => sanitize(t.split(" - ").head)).getOrElse("")
    if (pageUrl.contains("/data_objects/")) {
      extractDataObject(pageUrl, html, title, tags).toSeq
    } else {
      extractTaxonGallery(pageUrl, html, title, tags)
    }
  }

  /** EOL.py:100-170 — the single-image detail page. */
  private def extractDataObject(pageUrl: String, html: String,
      title: String, tags: Seq[String]): Option[EolImage] = {
    val landing = metaAttr(html, "property", "og:url").getOrElse(pageUrl)
    val fid = foreignId(landing).getOrElse("")
    for {
      media <- divBlock(html, "media")
      img <- """<a[^>]*href="([^"]+)"""".r.findFirstMatchIn(media)
        .map(_.group(1))
      src <- divBlock(html, "article source")
      lic <- ccHrefRe.findFirstMatchIn(src).map(_.group(1))
    } yield {
      val rightsHolder =
        """(?s)<p[^>]*title="Rights holder"[^>]*>(.*?)</p>""".r
          .findFirstMatchIn(src)
          .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")))
          .getOrElse("")
      val creator =
        """(?s)<p[^>]*>\s*Creator:(.*?)</p>""".r.findFirstMatchIn(src)
          .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")))
          .getOrElse("")
      EolImage(fid, landing, img.trim, "", lic, title, creator,
        rightsHolder, tags)
    }
  }

  /** EOL.py:192-288 — one row per image block of a taxon page;
    * blocks missing an image or a CC license are skipped. */
  private def extractTaxonGallery(pageUrl: String, html: String,
      title: String, tags: Seq[String]): Seq[EolImage] = {
    val gallery = """(?s)<div[^>]*class="images"[^>]*>(.*)""".r
      .findFirstMatchIn(html).map(_.group(1)).getOrElse(return Nil)
    val blocks = gallery.split("""<div[^>]*class="image"[^>]*>""").drop(1)
    blocks.toSeq.flatMap { block =>
      for {
        a <- """(?s)<a[^>]*href="([^"]+)"[^>]*>""".r
          .findFirstMatchIn(block).map(_.group(1))
        imgTag <- """(?s)<img([^>]*)>""".r.findFirstMatchIn(block)
          .map(_.group(1))
        src <- """src="([^"]+)"""".r.findFirstMatchIn(imgTag).map(_.group(1))
        attribution <- divBlock(block, "attribution")
        lic <- ccHrefRe.findFirstMatchIn(attribution).map(_.group(1))
      } yield {
        val thumb = """data-thumb="([^"]+)"""".r.findFirstMatchIn(imgTag)
          .map(_.group(1)).getOrElse("")
        val creator =
          """(?s)<p[^>]*class="[^"]*"[^>]*>(.*?)</p>""".r
            .findFirstMatchIn(attribution)
            .map(m => sanitize(m.group(1).replaceAll("<[^>]*>", "")
              .replace("Copyright", "")))
            .getOrElse("")
        EolImage(foreignId(a).getOrElse(""), pageUrl, src.trim, thumb,
          lic, title, creator, "", tags)
      }
    }
  }

  /** Distributed application: the typed flatMap Generator shape. */
  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[EolImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
