package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** Behance curated-gallery extraction (providers/commoncrawl/
  * Behance.py:21-190), re-specified from output behavior.
  *
  * The license is the anchor inside the copyright block (either
  * markup generation, :50-63, required). og:title/og:url/og:owners
  * supply title, landing URL and the page creator (:70-84); each
  * profile-info block yields an owner entry with name, profile URL
  * and the country/state/city parts of its location link's query
  * (:87-126) — the owner matching og:owners also sets the row's
  * creator URL (:105-106); tag anchors join as tags (:130-132);
  * og:description is the description (:136-139); one row per img in
  * the project-modules div, skipping the blank.png placeholder
  * (:174-190).
  */
object Behance {

  val provider = "behance"

  final case class Owner(
      name: String,
      creator_url: String,
      location: Map[String, String])

  final case class BehanceImage(
      foreign_landing_url: String,
      image_url: String,
      license: String,
      license_version: String,
      title: String,
      creator: String,
      creator_url: String,
      owners: Seq[Owner],
      tags: String,
      description: String,
      set_url: String)

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

  def extract(pageUrl: String, html: String): Seq[BehanceImage] = {
    val copyrightBlock =
      """(?s)<div[^>]*id="project-block-copyright"[^>]*>(.*?)</div>""".r
        .findFirstMatchIn(html).map(_.group(1))
        .orElse(
          """(?s)<div[^>]*class="ProjectCopyright-tooltipContent-LVf"[^>]*>(.*?)</div>""".r
            .findFirstMatchIn(html).map(_.group(1)))
    val lic = for {
      block <- copyrightBlock
      href <- """<a[^>]*href="([^"]+)"""".r.findFirstMatchIn(block)
        .map(_.group(1))
      (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
      l <- licOpt
    } yield (l, verOpt.getOrElse(""))
    val (license, version) = lic.getOrElse(return Nil)

    val title = metaContent(html, "og:title").map(sanitize).getOrElse("")
    val landing = metaContent(html, "og:url").getOrElse(pageUrl)
    val creator = metaContent(html, "og:owners").map(sanitize).getOrElse("")

    val ownerBlocks =
      """(?s)<div[^>]*class="rf-profile-item__info"[^>]*>(.*?)(?=<div[^>]*class="rf-profile-item__info"|\z)""".r
        .findAllMatchIn(html).map(_.group(1)).toSeq match {
          case Nil =>
            """(?s)<div[^>]*class="ProjectOwnersInfo-userInfo-2WK"[^>]*>(.*?)(?=<div[^>]*class="ProjectOwnersInfo-userInfo-2WK"|\z)""".r
              .findAllMatchIn(html).map(_.group(1)).toSeq
          case bs => bs
        }
    val owners: Seq[Owner] = ownerBlocks.flatMap { b =>
      """(?s)<a[^>]*class="(?:rf-profile-item__name js-mini-profile|ProjectOwnersInfo-userName-2oz js-mini-profile)"[^>]*href="([^"]+)"[^>]*>(.*?)</a>""".r
        .findFirstMatchIn(b).map { m =>
          val loc =
            """<a[^>]*class="(?:rf-profile-item__location|ProjectOwnersInfo-userLocation-_rE) beicons-pre beicons-pre-location"[^>]*href="([^"]+)"""".r
              .findFirstMatchIn(b).map(_.group(1)).map { link =>
                link.split("&").flatMap { part =>
                  val kv = part.split("=", 2)
                  val key = kv(0).trim.toLowerCase
                    .replaceAll("^.*\\?", "")
                  if (kv.length == 2 &&
                    Seq("country", "state", "city").exists(key.contains))
                    Some(key -> kv(1).trim.replace("+", " "))
                  else None
                }.toMap
              }.getOrElse(Map.empty[String, String])
          Owner(sanitize(text(m.group(2))), m.group(1).trim, loc)
        }
    }.distinct
    val creatorUrl = owners
      .find(_.name.toLowerCase == creator.toLowerCase)
      .map(_.creator_url).getOrElse("")

    val tags =
      """(?s)<a[^>]*class="(?:object-tag|ProjectTags-tagLink-Hh_)[^"]*"[^>]*>(.*?)</a>""".r
        .findAllMatchIn(html).map(m => sanitize(text(m.group(1))))
        .filter(_.nonEmpty).mkString(",")
    val description = metaContent(html, "og:description").map(sanitize)
      .getOrElse("")

    val modules = """(?s)<div[^>]*id="project-modules"[^>]*>(.*)""".r
      .findFirstMatchIn(html).map(_.group(1)).getOrElse(return Nil)
    """<img[^>]*>""".r.findAllIn(modules).toSeq.flatMap { imgTag =>
      attr(imgTag, "src").map(_.trim).filter(_.nonEmpty)
        .filterNot(_.contains("img/site/blank.png"))
        .map { src =>
          BehanceImage(
            foreign_landing_url = landing,
            image_url = src,
            license = license,
            license_version = version,
            title = title,
            creator = creator,
            creator_url = creatorUrl,
            owners = owners,
            tags = tags,
            description = description,
            set_url = landing)
        }
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[BehanceImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
