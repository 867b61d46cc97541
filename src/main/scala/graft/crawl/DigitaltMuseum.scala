package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** DigitaltMuseum extraction (providers/commoncrawl/
  * DigitaltMuseum.py:21-166), re-specified from output behavior.
  *
  * One row per li.media__item whose per-item license link (either
  * markup generation: media__license* or the slider variant) resolves
  * to CC (:107-121). The media--image anchor supplies a
  * domain-prefixed landing href and the img src/alt (:126-143,
  * src required); the page-level article title and leadtext
  * description are shared (:62-75); the 'Metadata' article section's
  * double-space-split li rows become metadata keys (:78-90); the
  * media__credit text after ':' is the creator (:147-151); multi-item
  * pages stamp the og:url as the set (:153-154).
  */
object DigitaltMuseum {

  val provider = "digitaltmuseum"
  val defaultDomain = "https://digitaltmuseum.org"

  final case class DigitaltImage(
      foreign_landing_url: String,
      image_url: String,
      license: String,
      license_version: String,
      title: String,
      creator: String,
      set_url: String,
      description: String,
      image_alt_text: String,
      article_metadata: Map[String, String])

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  private def text(html: String): String =
    html.replaceAll("<[^>]*>", "")

  def extract(pageUrl: String, html: String,
      domain: String = defaultDomain): Seq[DigitaltImage] = {
    val pageUrlMeta =
      """<meta[^>]*property="og:url"[^>]*>""".r.findFirstIn(html)
        .flatMap(attr(_, "content")).getOrElse(pageUrl)
    val desc =
      """(?s)<div[^>]*class="article__leadtext"[^>]*>(.*?)</div>""".r
        .findFirstMatchIn(html).flatMap(b =>
          """(?s)<p[^>]*>(.*?)</p>""".r.findFirstMatchIn(b.group(1))
            .map(m => text(m.group(1)).replace("Expand text", "").trim))
        .getOrElse("")
    val title =
      """(?s)<div[^>]*class="article__title"[^>]*>(.*?)</div>""".r
        .findFirstMatchIn(html).flatMap(b =>
          """(?s)<h1[^>]*>(.*?)</h1>""".r.findFirstMatchIn(b.group(1))
            .map(m => sanitize(text(m.group(1)))))
        .getOrElse("")
    val articleMeta: Map[String, String] =
      """(?s)<section[^>]*class="article__metadata"[^>]*>(.*?)</section>""".r
        .findAllMatchIn(html).flatMap { sec =>
          val body = sec.group(1)
          val isMeta = """(?s)<h2[^>]*>(.*?)</h2>""".r
            .findFirstMatchIn(body)
            .exists(h => text(h.group(1)).trim.toLowerCase == "metadata")
          if (!isMeta) Nil
          else """(?s)<li[^>]*>(.*?)</li>""".r.findAllMatchIn(body)
            .flatMap { li =>
              val parts = text(li.group(1)).trim.split("\\s{2,}")
              if (parts.length > 1)
                Some(parts(0).trim.toLowerCase.replace(" ", "_") ->
                  sanitize(parts(1)))
              else None
            }
        }.toMap
    val items = html
      .split("""<li[^>]*class="media__item"[^>]*>""").toSeq.drop(1)
    items.flatMap { item =>
      val licTag =
        """<a[^>]*class="media__license[^"]*"[^>]*>|<a[^>]*class="c-media-slider__license-link"[^>]*>""".r
          .findFirstIn(item)
      for {
        tag <- licTag
        href <- attr(tag, "href")
        (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
        lic <- licOpt
        mediaA <- """<a[^>]*class="module__media\s+media--image"[^>]*>""".r
          .findFirstIn(item)
        imgTag = """<img[^>]*>""".r.findFirstIn(item)
        src <- imgTag.flatMap(attr(_, "src")).filter(_.nonEmpty)
      } yield {
        val creator =
          """(?s)<i[^>]*class="media__credit"[^>]*>(.*?)</i>""".r
            .findFirstMatchIn(item).map(m => text(m.group(1)))
            .filter(_.contains(":"))
            .map(t => sanitize(t.split(":", 2)(1)))
            .getOrElse("")
        val meta = articleMeta ++
          imgTag.flatMap(attr(_, "alt")).filter(_.nonEmpty)
            .map(a => "image_alt_text" -> sanitize(a)) ++
          (if (desc.nonEmpty) Seq("description" -> sanitize(desc)) else Nil)
        DigitaltImage(
          foreign_landing_url =
            s"$domain${attr(mediaA, "href").getOrElse("")}",
          image_url = src,
          license = lic,
          license_version = verOpt.getOrElse(""),
          title = title,
          creator = creator,
          set_url = if (items.length > 1) pageUrlMeta else "",
          description = desc,
          image_alt_text = imgTag.flatMap(attr(_, "alt"))
            .map(sanitize).getOrElse(""),
          article_metadata = meta)
      }
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[DigitaltImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
