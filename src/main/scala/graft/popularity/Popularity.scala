package graft.popularity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Provider-normalized popularity pipeline, ported from
  * util/popularity/sql.py:140-243.
  *
  * Stage 1 (A5): per-provider exact discrete percentile of a metric
  * read out of the semi-structured metadata column.
  * Stage 2: constants  c = ((1 - p) / p) * value  with the raw_value=0
  * -> 1 guard (sql.py:193-197).
  * Stage 3 (J8): standardized popularity  x / (x + c)  via a broadcast
  * join against the tiny constants table — the reference's correlated
  * scalar-function lookup rewritten as a join so Catalyst can plan it
  * (SURVEY §4: the one place the reference leans on the DB planner).
  *
  * Scale: stage 1 is one hash-partial + shuffle-on-provider exact
  * percentile; stage 3 broadcasts a per-provider constants table
  * (O(#providers) rows) — no second shuffle at any data size.
  */
object Popularity {

  /** A5/W2: percentile_disc(p) WITHIN GROUP (ORDER BY metric) per
    * provider (sql.py:155-160). `metric` must be a numeric column
    * (extract from JSON upstream with get_json_object + cast). */
  def percentileConstants(
      df: DataFrame,
      providerCol: String,
      metric: Column,
      percentile: Double): DataFrame = {
    val pLit = lit(percentile)
    df.select(col(providerCol), metric.cast("double").as("__m"))
      .groupBy(col(providerCol))
      .agg(expr(s"percentile_disc($percentile) WITHIN GROUP (ORDER BY __m)")
        .as("raw_value"))
      .withColumn("value", when(col("raw_value") === 0, 1.0).otherwise(col("raw_value")))
      .withColumn("percentile", pLit)
      .withColumn("constant", ((lit(1.0) - pLit) / pLit) * col("value"))
  }

  /** J8 + math: x / (x + c), null-propagating (RETURNS NULL ON NULL
    * INPUT, sql.py:224-243). `constants` is percentileConstants'
    * output; it is broadcast — it has one row per provider. */
  def standardized(
      df: DataFrame,
      providerCol: String,
      metric: Column,
      constants: DataFrame): DataFrame = {
    val consts = broadcast(constants.select(
      col(providerCol).as("__prov"), col("constant")))
    val x = metric.cast("double")
    df.join(consts, df(providerCol) === col("__prov"), "left_outer")
      .withColumn("standardized_popularity",
        when(x.isNull || col("constant").isNull, lit(null))
          .otherwise(x / (x + col("constant"))))
      .drop("__prov", "constant")
  }
}
