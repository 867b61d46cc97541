package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** Animal Diversity Web extraction (providers/commoncrawl/
  * AnimalDiversityWeb.py:32-186), re-specified from output behavior.
  *
  * One page yields at most one row: rel="license" anchor resolves the
  * CC license (:61-71); img.resource supplies a domain-prefixed src,
  * data-width/data-height dims and alt text (:74-86, required);
  * og:title is the title (:90-92); the metadata section's h3 -> next-p
  * pairs become metadata minus conditions_of_use (:96-109); keyword
  * lists split on '::' into distinct tags (:113-121); classification
  * and related-taxa wells map rank -> 'taxon / vernacular' (:125-172);
  * og:url is the landing URL (:175).
  */
object AnimalDiversity {

  val provider = "animaldiversity"
  val defaultDomain = "https://animaldiversity.org"

  final case class AdwImage(
      foreign_landing_url: String,
      image_url: String,
      width: String,
      height: String,
      license: String,
      license_version: String,
      title: String,
      image_alt_text: String,
      metadata: Map[String, String],
      tags: Seq[String],
      classification: Map[String, String],
      related_taxa: Map[String, String])

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  private def metaContent(html: String, prop: String): Option[String] =
    s"""<meta\\s+[^>]*property="$prop"[^>]*>""".r.findFirstIn(html)
      .flatMap(attr(_, "content"))

  private def text(html: String): String =
    html.replaceAll("<[^>]*>", "").trim

  /** rank -> 'taxon / vernacular' per li of a taxonomy well. */
  private def taxaMap(block: String): Map[String, String] =
    """(?s)<li[^>]*>(.*?)</li>""".r.findAllMatchIn(block).flatMap { li =>
      val rank = """(?s)<span[^>]*class="rank"[^>]*>(.*?)</span>""".r
        .findFirstMatchIn(li.group(1)).map(m => text(m.group(1)).toLowerCase)
      val taxon = """(?s)<a[^>]*class="taxon-name[^"]*"[^>]*>(.*?)</a>""".r
        .findFirstMatchIn(li.group(1)).map(m => text(m.group(1)))
      val vern = """(?s)<span[^>]*class="vernacular-name"[^>]*>(.*?)</span>""".r
        .findFirstMatchIn(li.group(1)).map(m => text(m.group(1)))
      rank.map(r => r -> s"${taxon.orNull} / ${vern.orNull}")
    }.toMap

  def extract(pageUrl: String, html: String,
      domain: String = defaultDomain): Option[AdwImage] = {
    for {
      licTag <- """<a[^>]*rel="license"[^>]*>""".r.findFirstIn(html)
      href <- attr(licTag, "href")
      (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
      lic <- licOpt
      imgTag <- """<img[^>]*class="resource"[^>]*>""".r.findFirstIn(html)
      src <- attr(imgTag, "src").filter(_.nonEmpty)
    } yield {
      val metadata: Map[String, String] = {
        val section =
          """(?s)<section[^>]*class="metadata"[^>]*>(.*?)</section>""".r
            .findFirstMatchIn(html).map(_.group(1)).getOrElse("")
        val pairs =
          """(?s)<h3[^>]*>(.*?)</h3>\s*<p[^>]*>(.*?)</p>""".r
            .findAllMatchIn(section)
            .map(m => (text(m.group(1)).toLowerCase.replace(" ", "_"),
              text(m.group(2)))).toMap
        pairs - "conditions_of_use"
      }
      val tags =
        """(?s)<ul[^>]*class="keywords(?: last)?"[^>]*>(.*?)</ul>""".r
          .findAllMatchIn(html).flatMap { ul =>
            """(?s)<li(?![^>]*class=)[^>]*>(.*?)</li>""".r
              .findFirstMatchIn(ul.group(1))
              .toSeq.flatMap(m => text(m.group(1)).split("::")
                .map(_.trim).filter(_.nonEmpty))
          }.toSeq.distinct
      val classification =
        """(?s)<div[^>]*class="classification well"[^>]*>(.*?)</div>""".r
          .findFirstMatchIn(html).map(m => taxaMap(m.group(1)))
          .getOrElse(Map.empty)
      val related =
        """(?s)<div[^>]*class="related navlist well"[^>]*>(.*?)</div>""".r
          .findFirstMatchIn(html).map(m => taxaMap(m.group(1)))
          .getOrElse(Map.empty)
      AdwImage(
        foreign_landing_url = metaContent(html, "og:url").getOrElse(pageUrl),
        image_url = s"${domain.stripSuffix("%")}$src",
        width = attr(imgTag, "data-width").getOrElse(""),
        height = attr(imgTag, "data-height").getOrElse(""),
        license = lic,
        license_version = verOpt.getOrElse(""),
        title = metaContent(html, "og:title").getOrElse(""),
        image_alt_text = attr(imgTag, "alt").getOrElse(""),
        metadata = metadata,
        tags = tags,
        classification = classification,
        related_taxa = related)
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[AdwImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
