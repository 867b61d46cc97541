package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** §2.9 UDTF-shaped extraction: one fetched page (HTML) or one API
  * JSON payload -> 0..N image-metadata rows.
  *
  * The reference implements 15 BeautifulSoup extractor classes
  * (providers/commoncrawl/EOL.py:28-296 et al.) and ~15 API pluck
  * scripts (provider_api_scripts/flickr.py:316-330, ...). The engine
  * keeps the reference's *shape* — a per-provider extractor behind one
  * trait, applied as a typed flatMap so Catalyst sees a Generator-like
  * 1->N operator with no driver involvement — while the per-provider
  * selector programs are data, not architecture. Two concrete
  * extractors pin the contract: a regex HTML gallery extractor (EOL's
  * many-rows-per-page behavior) and a Flickr-style JSON extractor with
  * the l->m->s size preference and sorted-distinct tags.
  */
object Extractors {

  final case class ExtractedImage(
      foreign_identifier: String,
      foreign_landing_url: String,
      image_url: String,
      license_path: String,
      title: String,
      tags: Seq[String])

  /** Base contract (Provider.py:282-300 getMetaData): page -> rows. */
  trait PageExtractor extends Serializable {
    def provider: String
    def extract(pageUrl: String, html: String): Seq[ExtractedImage]
  }

  /** A gallery-page extractor in the EOL mold (EOL.py:28-296): every
    * <a class="image" href=LANDING><img src=IMG></a> block yields one
    * row; per-image fields reset per block (the reference's
    * partial-state carryover is a documented bug we do NOT reproduce —
    * SURVEY §7.4.8 specs from output, not control flow). */
  final class GalleryExtractor(val provider: String) extends PageExtractor {
    private val block =
      """(?s)<a[^>]*class="image"[^>]*href="([^"]+)"[^>]*>\s*<img([^>]*)>""".r
    private val srcRe = """src="([^"]+)"""".r
    private val altRe = """alt="([^"]*)"""".r
    private val licenseRe = """href="https?://creativecommons\.org(/[^"]+)"""".r

    def extract(pageUrl: String, html: String): Seq[ExtractedImage] = {
      val license = licenseRe.findFirstMatchIn(html).map(_.group(1)).getOrElse("")
      block.findAllMatchIn(html).flatMap { m =>
        val landing = m.group(1)
        val imgAttrs = m.group(2)
        srcRe.findFirstMatchIn(imgAttrs).map { src =>
          ExtractedImage(
            foreign_identifier = landing.split("/").lastOption.getOrElse(landing),
            foreign_landing_url = landing,
            image_url = src.group(1),
            license_path = license,
            title = altRe.findFirstMatchIn(imgAttrs).map(_.group(1)).getOrElse(""),
            tags = Nil)
        }
      }.toSeq
    }
  }

  /** Flickr-style API JSON extraction (flickr.py:316-381): size
    * preference url_l -> url_m -> url_s, sorted-distinct whitespace
    * tags (the idempotent-upsert invariant, flickr.py:377-381).
    * Column-level — stays in codegen, no UDF. */
  def flickrStyleFromJson(raw: DataFrame, jsonCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      """id STRING, owner STRING, title STRING, license STRING,
        |url_l STRING, url_m STRING, url_s STRING,
        |height_l STRING, width_l STRING, tags STRING""".stripMargin
        .replace("\n", " "))
    raw.select(from_json(col(jsonCol), schema).as("p"))
      .select(
        col("p.id").as("foreign_identifier"),
        concat(lit("https://www.flickr.com/photos/"), col("p.owner"),
          lit("/"), col("p.id")).as("foreign_landing_url"),
        coalesce(col("p.url_l"), col("p.url_m"), col("p.url_s")).as("image_url"),
        col("p.license").as("license_"),
        col("p.title").as("title"),
        array_sort(array_distinct(split(trim(col("p.tags")), "\\s+"))).as("tags"))
      .filter(col("foreign_identifier").isNotNull &&
        col("image_url").isNotNull)
  }

  /** Apply a PageExtractor as a typed flatMap (the Generator shape). */
  def extractAll(pages: Dataset[WarcStore.FetchedPage], ex: PageExtractor)
      : Dataset[ExtractedImage] = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => ex.extract(p.url, p.html))
  }

  /** Smithsonian-style creator-type ranking (smithsonian.py:42-101):
    * among (type, name) candidate pairs, the creator with the
    * lowest-preference type wins; unknown types never win over known
    * ones. Column-level via array_sort on (rank, order, name)
    * structs. `creatorTypes` is the static preference map. */
  val creatorTypePreference: Map[String, Int] = Map(
    "artist" -> 0, "author" -> 0, "creator" -> 0, "photographer" -> 0,
    "architect" -> 1, "designer" -> 1, "illustrator" -> 1, "sculptor" -> 1,
    "maker" -> 2, "engraver" -> 2, "producer" -> 2, "cartographer" -> 2,
    "painter" -> 3, "inventor" -> 3, "lithographer" -> 3,
    "manufacturer" -> 4, "publisher" -> 4, "editor" -> 4,
    "patentee" -> 5, "collector" -> 6)

  def preferredCreator(candidates: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    // candidates: array<struct<ctype: string, name: string>>
    val rankMap = map(creatorTypePreference.toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val ranked = filter(
      transform(candidates, c =>
        struct(element_at(rankMap, c.getField("ctype")).as("rank"),
          c.getField("name").as("name"))),
      r => r.getField("rank").isNotNull)
    when(size(ranked) > 0, array_min(ranked).getField("name"))
      .otherwise(lit(null))
  }

  /** Behance-style popularity-metric scrape (Behance.py:157-170) +
    * FloraOn-style watermark flag (FloraOn.py:49): thumbnails carry
    * likes/views/comments counters into meta_data and are always
    * watermarked. Regex HTML variant of the metrics extraction. */
  final class MetricsExtractor(val provider: String) extends PageExtractor {
    private val linkRe = """<a[^>]*rel="license"[^>]*href="([^"]+)"""".r
    private val imgRe = """<img[^>]*src="([^"]+)"""".r
    private def metric(html: String, cls: String): Option[String] = {
      s"""class="beicons-pre-$cls"[^>]*>([0-9,]+)<""".r
        .findFirstMatchIn(html).map(_.group(1).replace(",", ""))
    }
    def extract(pageUrl: String, html: String): Seq[ExtractedImage] =
      // chunk per thumbnail block: each chunk runs to the next block
      // (or end of page), so nested divs can't truncate the scope
      html.split("""class="thumbnail"""").drop(1).toSeq
        .zipWithIndex.flatMap { case (inner, i) =>
        imgRe.findFirstMatchIn(inner).map { img =>
          val metrics = Seq("thumb" -> "likes", "eye" -> "views",
            "comment" -> "comments").flatMap { case (cls, name) =>
            metric(inner, cls).map(v => s"$name=$v")
          }
          ExtractedImage(
            foreign_identifier = s"$pageUrl#$i",
            foreign_landing_url = pageUrl,
            image_url = img.group(1),
            license_path = linkRe.findFirstMatchIn(inner).map { l =>
              l.group(1).replaceFirst("^https?://creativecommons\\.org", "")
            }.getOrElse(""),
            title = "",
            tags = metrics :+ "watermarked=t")
        }
      }
  }
}
