package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** IHA holiday-ads slider extraction (providers/commoncrawl/
  * IHA.py:23-116), re-specified from output behavior.
  *
  * One row per span.swiper-slide inside the div.ph slider: each slide
  * carries its own rel="license" anchor (:69-79), the slide's `about`
  * attribute is BOTH the image URL and the foreign id (:92-98, rows
  * without it are skipped), the img child supplies
  * thumbnail/alt/width/height/title (:83-89), the page-level og:url
  * is the landing URL (:63-65), page keywords land in meta tags
  * (:106-108), and every row is flagged watermarked (:58).
  */
object Iha {

  val provider = "iha"

  final case class IhaImage(
      foreign_identifier: String,
      foreign_landing_url: String,
      image_url: String,
      thumbnail_url: String,
      width: String,
      height: String,
      license: String,
      license_version: String,
      title: String,
      image_alt_text: String,
      tags: String,
      watermarked: String)

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  def extract(pageUrl: String, html: String): Seq[IhaImage] = {
    val slider = """(?s)<div[^>]*class="ph"[^>]*>(.*)""".r
      .findFirstMatchIn(html).map(_.group(1)).getOrElse(return Nil)
    val landing =
      """<meta[^>]*property="og:url"[^>]*>""".r.findFirstIn(html)
        .flatMap(attr(_, "content")).getOrElse(pageUrl)
    val keywords =
      """<meta[^>]*name="keywords"[^>]*>""".r.findFirstIn(html)
        .flatMap(attr(_, "content")).getOrElse("")
    val slides = slider
      .split("""<span[^>]*class="swiper-slide"""").toSeq.drop(1)
      // re-attach the attributes chopped off by the split so `about=`
      // stays readable per-slide
      .map("<span class=\"swiper-slide" + _)
    slides.flatMap { slide =>
      val slideTag = """(?s)^<span[^>]*>""".r.findFirstIn(slide)
        .getOrElse("")
      for {
        licTag <- """<a[^>]*rel="license"[^>]*>""".r.findFirstIn(slide)
        href <- attr(licTag, "href")
        (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
        lic <- licOpt
        about <- attr(slideTag, "about").map(_.trim).filter(_.nonEmpty)
      } yield {
        val imgTag = """<img[^>]*>""".r.findFirstIn(slide)
        IhaImage(
          foreign_identifier = about,
          foreign_landing_url = landing,
          image_url = about,
          thumbnail_url = imgTag.flatMap(attr(_, "src")).getOrElse(""),
          width = imgTag.flatMap(attr(_, "width")).getOrElse(""),
          height = imgTag.flatMap(attr(_, "height")).getOrElse(""),
          license = lic,
          license_version = verOpt.getOrElse(""),
          title = imgTag.flatMap(attr(_, "title")).map(sanitize)
            .getOrElse(""),
          image_alt_text = imgTag.flatMap(attr(_, "alt")).map(sanitize)
            .getOrElse(""),
          tags = keywords,
          watermarked = "t")
      }
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[IhaImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
