package graft.providers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Thingiverse CC0 3D-model extraction, set-oriented.
  *
  * The reference (provider_api_scripts/Thingiverse.py) fetches three
  * payloads per thing — the thing, its tags, and its files — and
  * emits one row per file with a default image: a substring CC0
  * license gate (:64-71), first+last -> name creator fallback
  * (:91-98), public_url landing fallback (:84-87), and an
  * ORDER-DEPENDENT size fold over default_image.sizes (:143-158):
  * display/medium sets the thumbnail (and the image if still unset),
  * display/large sets the image, any other display size backfills the
  * image from the current thumbnail.
  */
object Thingiverse {

  val provider = "thingiverse"
  val licenseText = "creative commons - public domain dedication"

  val thingSchema: DataType = DataType.fromDDL(
    """STRUCT<
      |id: BIGINT, name: STRING, license: STRING, description: STRING,
      |public_url: STRING, modified: STRING,
      |creator: STRUCT<first_name: STRING, last_name: STRING,
      |  name: STRING, public_url: STRING>
      |>""".stripMargin.replace("\n", " "))

  val tagsSchema: DataType =
    DataType.fromDDL("ARRAY<STRUCT<name: STRING>>")

  val filesSchema: DataType = DataType.fromDDL(
    """ARRAY<STRUCT<default_image: STRUCT<
      |id: BIGINT, url: STRING,
      |sizes: ARRAY<STRUCT<type: STRING, size: STRING, url: STRING>>>>>"""
      .stripMargin.replace("\n", " "))

  private def sanitize(c: Column): Column =
    trim(regexp_replace(regexp_replace(coalesce(c, lit("")),
      "\"", "'"), "\\s+", " "))

  /** `getMetaData`'s size fold (Thingiverse.py:143-158), order
    * faithful: struct(img, thumb) after scanning `sizes`. */
  def imagePick(sizes: Column): Column =
    aggregate(
      coalesce(sizes,
        array().cast("array<struct<type:string,size:string,url:string>>")),
      struct(lit(null).cast("string").as("img"),
        lit(null).cast("string").as("thumb")),
      (acc, s) => {
        val isDisplay = lower(trim(s.getField("type"))) === "display"
        val size = lower(s.getField("size"))
        val newThumb = when(isDisplay && size === "medium",
          trim(s.getField("url"))).otherwise(acc.getField("thumb"))
        val newImg = when(!isDisplay, acc.getField("img"))
          .when(size === "large", trim(s.getField("url")))
          .when(acc.getField("img").isNull, newThumb)
          .otherwise(acc.getField("img"))
        struct(newImg.as("img"), newThumb.as("thumb"))
      })

  /** Creator: 'first last', blank -> creator.name (:91-98). */
  def creator(c: Column): Column = {
    val joined = trim(concat_ws(" ", sanitize(c.getField("first_name")),
      sanitize(c.getField("last_name"))))
    when(length(joined) > 0, joined)
      .otherwise(sanitize(c.getField("name")))
  }

  /** One input row per thing: (thingJson, tagsJson, filesJson) ->
    * one output row per file with a CC0 license and an image. */
  def imageRows(raw: DataFrame, thingCol: String, tagsCol: String,
      filesCol: String): DataFrame = {
    val t = from_json(col(thingCol), thingSchema)
    val tags = from_json(col(tagsCol), tagsSchema)
    val files = from_json(col(filesCol), filesSchema)
    val pick = imagePick(col("f").getField("default_image")
      .getField("sizes"))
    raw
      .select(t.as("t"), tags.as("tags"), files.as("files"))
      .filter(lower(coalesce(col("t.license"), lit("")))
        .contains(licenseText))
      .select(col("t"), col("tags"), explode(col("files")).as("f"))
      .filter(col("f.default_image").isNotNull &&
        col("f.default_image.url").isNotNull)
      .withColumn("pick", pick)
      .filter(col("pick.img").isNotNull)
      .select(
        coalesce(col("f.default_image.id").cast("string"),
          col("pick.img")).as("foreign_identifier"),
        coalesce(trim(col("t.public_url")),
          concat(lit("https://www.thingiverse.com/thing:"),
            col("t.id").cast("string"))).as("foreign_landing_url"),
        col("pick.img").as("image_url"),
        col("pick.thumb").as("thumbnail_url"),
        lit("CC0").as("license"),
        lit("1.0").as("license_version"),
        creator(col("t.creator")).as("creator"),
        col("t.creator.public_url").as("creator_url"),
        sanitize(col("t.name")).as("title"),
        map(
          lit("description"), sanitize(col("t.description")),
          lit("3d_model"), col("f.default_image.url")).as("meta_data"),
        transform(coalesce(col("tags"),
          array().cast("array<struct<name:string>>")),
          x => trim(x.getField("name"))).as("tags"))
  }
}
