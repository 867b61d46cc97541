package graft.crawl

import org.apache.spark.sql.Dataset

import graft.license.Licenses

/** Flora-On plant-gallery extraction (providers/commoncrawl/
  * FloraOn.py:19-119), re-specified from output behavior.
  *
  * One row per div.thumbnail inside the fotochooser div, each with
  * its own license anchor (:47-60). The img.image src is
  * domain-prefixed (:63-71); wid/hei/aut hidden inputs carry
  * dimensions and creator (:73-87); the page-level span.especie is
  * the lowercased title (:81-83); fic-ecologia detail blocks and the
  * related-species list fill the metadata (:95-111); all rows are
  * watermarked (:49).
  */
object FloraOn {

  val provider = "floraon"
  val defaultDomain = "https://flora-on.pt"

  final case class FloraImage(
      foreign_landing_url: String,
      image_url: String,
      width: String,
      height: String,
      license: String,
      license_version: String,
      title: String,
      creator: String,
      image_alt_text: String,
      details: Map[String, String],
      watermarked: String)

  private def sanitize(s: String): String =
    s.trim.replace("\"", "'").replaceAll("[\\n\\r]", " ")
      .replaceAll("\\s+", " ").trim

  private def attr(tag: String, name: String): Option[String] =
    s"""$name="([^"]*)"""".r.findFirstMatchIn(tag).map(_.group(1))

  private def inputValue(block: String, name: String): Option[String] =
    s"""<input[^>]*name="$name"[^>]*>""".r.findFirstIn(block)
      .flatMap(attr(_, "value"))

  def extract(pageUrl: String, html: String,
      domain: String = defaultDomain): Seq[FloraImage] = {
    val chooser = """(?s)<div[^>]*id="fotochooser"[^>]*>(.*)""".r
      .findFirstMatchIn(html).map(_.group(1)).getOrElse(return Nil)
    val title =
      """(?s)<span[^>]*class="especie"[^>]*>(.*?)</span>""".r
        .findFirstMatchIn(html)
        .map(m => m.group(1).replaceAll("<[^>]*>", "").trim.toLowerCase)
        .getOrElse("")
    // fic-ecologia details are page-level, shared by every row
    val details: Map[String, String] = {
      val eco = """(?s)<div[^>]*id="fic-ecologia"[^>]*>(.*)""".r
        .findFirstMatchIn(html).map(_.group(1)).getOrElse("")
      """(?s)<div[^>]*class="fic-detalhe"[^>]*>(.*?)(?=<div[^>]*class="fic-detalhe"|\z)""".r
        .findAllMatchIn(eco).flatMap { d =>
          for {
            k <- """(?s)<div[^>]*class="head"[^>]*>(.*?)</div>""".r
              .findFirstMatchIn(d.group(1))
            v <- """(?s)<div[^>]*class="content"[^>]*>(.*?)</div>""".r
              .findFirstMatchIn(d.group(1))
          } yield (k.group(1).replaceAll("<[^>]*>", "").trim.toLowerCase
            .replace(" ", "_"),
            v.group(1).replaceAll("<[^>]*>", "").trim)
        }.toMap
    }
    val related: Map[String, String] = {
      """(?s)<div[^>]*id="detalhes-especie"[^>]*>(.*)""".r
        .findFirstMatchIn(html).map(_.group(1)).flatMap { sp =>
          """(?s)<span[^>]*class="showtooltip big"[^>]*>(.*?)</span>""".r
            .findFirstMatchIn(sp).map { k =>
              val vals = """(?s)<i[^>]*>(.*?)</i>""".r.findAllMatchIn(sp)
                .map(m => m.group(1).replaceAll("<[^>]*>", "").trim)
                .filter(v => v.nonEmpty && v != "Download").toSeq
              (k.group(1).replaceAll("<[^>]*>", "").trim.toLowerCase
                .replace(" ", "_"), vals.mkString(","))
            }
        }.toMap
    }
    val blocks = chooser
      .split("""<div[^>]*class="thumbnail"[^>]*>""").toSeq.drop(1)
    blocks.flatMap { block =>
      for {
        licTag <- """<a[^>]*rel="license"[^>]*>""".r.findFirstIn(block)
        href <- attr(licTag, "href")
        (licOpt, verOpt, _) = Licenses.infoFromUrl(href.trim)
        lic <- licOpt
        imgTag <- """<img[^>]*class="image"[^>]*>""".r.findFirstIn(block)
        src <- attr(imgTag, "src").filter(_.nonEmpty)
      } yield FloraImage(
        foreign_landing_url = pageUrl,
        image_url = s"${domain.stripSuffix("%")}/$src",
        width = inputValue(block, "wid").getOrElse(""),
        height = inputValue(block, "hei").getOrElse(""),
        license = lic,
        license_version = verOpt.getOrElse(""),
        title = title,
        creator = inputValue(block, "aut").getOrElse(""),
        image_alt_text = attr(imgTag, "alt").getOrElse(""),
        details = details ++ related,
        watermarked = "t")
    }
  }

  def extractAll(pages: Dataset[WarcStore.FetchedPage])
      : Dataset[FloraImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => extract(p.url, p.html))
  }
}
