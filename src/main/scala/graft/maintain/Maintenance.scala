package graft.maintain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ongoing-maintenance operators from the reference's loader
  * (util/loader/sql.py:406-667) and merge_cc_tags.py.
  */
object Maintenance {

  /** P10: expiration predicate (sql.py:636-645) — rows whose
    * updated_on predates a per-provider staleness interval. The
    * interval map (sql.py:16-28) is a tiny broadcast dim. `now` is an
    * explicit column for determinism. */
  def expired(
      df: DataFrame,
      providerCol: String,
      updatedOnCol: String,
      intervalDays: Map[String, Int],
      now: Column)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dim = broadcast(
      intervalDays.toSeq.toDF("__prov", "__days"))
    df.join(dim, df(providerCol) === col("__prov"))
      .filter(col(updatedOnCol) <
        now - col("__days") * expr("INTERVAL '1' DAY"))
      .drop("__prov", "__days")
  }

  /** J3: sub-provider reassignment via a small lookup join
    * (sql.py:406-451): rows of `provider` whose `keyCol` appears in
    * the lookup get `source` replaced by the mapped sub-provider. */
  def subProviderReassign(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      lookup: Map[String, String])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dim = broadcast(lookup.toSeq.toDF("__key", "__sub"))
    df.join(dim, df(keyCol) === col("__key"), "left_outer")
      .withColumn(sourceCol, coalesce(col("__sub"), col(sourceCol)))
      .drop("__key", "__sub")
  }

  /** J5: Smithsonian-style unit-code lookup (sql.py:568-618): the
    * {sub_provider -> set(codes)} dict becomes an exploded
    * (code, sub_provider) dim joined broadcast on the code. */
  def unitCodeLookup(
      df: DataFrame,
      codeCol: String,
      outCol: String,
      subProviders: Map[String, Seq[String]])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pairs = subProviders.toSeq.flatMap { case (sub, codes) =>
      codes.map(c => (c, sub))
    }
    val dim = broadcast(pairs.toDF("__code", "__sub"))
    df.join(dim, df(codeCol) === col("__code"), "left_outer")
      .withColumn(outCol, col("__sub"))
      .drop("__code", "__sub")
  }

  /** J6: transformed-key URL normalization (merge_cc_tags.py:29-67):
    * strip the scheme and any trailing slash so http/https and
    * trailing-slash variants of the same URL join. */
  def normalizedUrlKey(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), "^https?://", ""), "/+$", "")

  /** J6: tag back-merge — join old (cc) rows to new (api) rows on the
    * normalized URL key and merge tags/meta via the J1 rules. */
  def transformedKeyJoin(
      left: DataFrame,
      right: DataFrame,
      leftUrl: String,
      rightUrl: String): DataFrame =
    left.join(right,
      normalizedUrlKey(left(leftUrl)) === normalizedUrlKey(right(rightUrl)))

  /** P11: hex-prefix range slice (pg_cleaner.py:172-194) — the
    * reference iterates md5-prefix ranges to partition a huge table
    * into bounded re-cleaning batches. */
  def hexPrefixSlice(df: DataFrame, keyCol: Column, lo: String, hi: String): DataFrame =
    df.filter(md5(keyCol) >= lo && md5(keyCol) < hi)

  import graft.providers.ProviderDetails

  /** Flickr sub-provider update (sql.py:354-446, acceptance
    * test_sql.py:1272): flickr rows whose creator_url is one of the
    * known sub-provider photostreams get source reassigned. The NSID
    * dictionary becomes a broadcast (creator_url, sub_provider) dim —
    * the reference's temp table — joined once; everything else keeps
    * its source. */
  def updateFlickrSubProviders(
      images: DataFrame,
      subProviders: Map[String, Set[String]] =
        ProviderDetails.flickrSubProviders,
      photoUrlBase: String = "https://www.flickr.com/photos/")(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dim = broadcast(subProviders.toSeq.flatMap { case (sub, nsids) =>
      nsids.toSeq.map(n => (photoUrlBase + n, sub))
    }.toDF("__curl", "__sub"))
    images.join(dim,
      images("creator_url") === col("__curl") &&
        images("provider") === ProviderDetails.FlickrDefaultProvider,
      "left_outer")
      .withColumn("source", coalesce(col("__sub"), col("source")))
      .drop("__curl", "__sub")
  }

  /** Europeana sub-provider update (sql.py:504-566, acceptance
    * test_sql.py:1332): meta_data carries `dataProvider` as a JSON
    * array; a europeana row whose array contains a known collection
    * gets that sub-provider as source. More than one eligible
    * sub-provider is a data error — the reference raises, and so does
    * this plan (raise_error), at the first offending row. Pure
    * projection: the dictionary inlines as literals, no join. */
  def updateEuropeanaSubProviders(
      images: DataFrame,
      subProviders: Map[String, String] =
        ProviderDetails.europeanaSubProviders): DataFrame = {
    val dps = from_json(element_at(col("meta_data"), "dataProvider"),
      org.apache.spark.sql.types.DataType.fromDDL("ARRAY<STRING>"))
    val eligible = filter(
      array(subProviders.toSeq.map { case (sub, dp) =>
        struct(lit(sub).as("sub"), lit(dp).as("dp"))
      }: _*),
      s => array_contains(dps, s.getField("dp")))
    val isEu = col("provider") === ProviderDetails.EuropeanaDefaultProvider
    images.withColumn("source",
      when(isEu && size(eligible) > 1,
        raise_error(concat(
          lit("More than one sub-provider identified for the image "
            + "with foreign ID "), col("foreign_identifier"))))
        .when(isEu && size(eligible) === 1,
          element_at(eligible, 1).getField("sub"))
        .otherwise(col("source")))
  }

  /** Smithsonian sub-provider update (sql.py:568-618, acceptance
    * test_sql.py:1398): smithsonian rows not yet reassigned (source
    * still 'smithsonian') take the sub-provider of their meta_data
    * unit_code; an unknown unit code raises, as in the reference. */
  def updateSmithsonianSubProviders(
      images: DataFrame,
      subProviders: Map[String, Set[String]] =
        ProviderDetails.smithsonianSubProviders): DataFrame = {
    val inv = ProviderDetails.invert(subProviders)
    val m = map(inv.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val pending =
      col("provider") === ProviderDetails.SmithsonianDefaultProvider &&
        col("source") === ProviderDetails.SmithsonianDefaultProvider
    val unit = trim(element_at(col("meta_data"), "unit_code"))
    images.withColumn("source",
      when(pending, coalesce(element_at(m, unit),
        raise_error(concat(lit("An unknown unit code value "),
          coalesce(unit, lit("null")), lit(" encountered")))))
        .otherwise(col("source")))
  }
}
