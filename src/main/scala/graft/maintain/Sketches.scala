package graft.maintain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based scale paths for the exact aggregates in §2.5/§2.6.
  *
  * The exact forms stay the correctness oracles (q_a2_top_domains'
  * countDistinct, q_a5_percentile's percentile_disc); these are the
  * 100 TB substitutes: a HyperLogLog++ register set or a quantile
  * sketch is a few KB per group, merges associatively map-side, and
  * never shuffles the distinct values themselves — the difference
  * between a bounded-memory aggregate and one whose shuffle width is
  * the cardinality of the data. Error knobs (rsd / accuracy) are the
  * explicit cost dial; the specs pin the bound actually delivered.
  */
object Sketches {

  /** D4 scale path: per-group approximate distinct count (HLL++).
    * rsd = target relative standard deviation (default 2%). */
  def distinctCount(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    rsd: Double = 0.02): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** W2 scale path: per-group quantiles from a mergeable sketch.
    * `accuracy` is the inverse per-summary rank-error target; partial
    * merges inflate it somewhat, so the delivered bound (pinned in
    * SketchesSpec) is ~1% of n at accuracy=10000 — tighten by raising
    * accuracy (memory grows linearly). */
  def percentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pArr = array(ps.map(lit): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol), pArr, lit(accuracy))
        .as("approx_percentiles"))
  }

  /** Top-k heavy hitters without a global sort: per-group counts,
    * then a bounded TakeOrderedAndProject — the plan shape O1 relies
    * on (no full-sort Exchange, only a size-k heap per partition). */
  def topK(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol)).limit(k)
}
