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
}
