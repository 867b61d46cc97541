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

  /** O(k)-state frequent items (Misra-Gries / mergeable-summaries
    * form — public literature: Misra & Gries '82; Agarwal et al.
    * "Mergeable Summaries", PODS'12). topK above still shuffles one
    * counter PER DISTINCT KEY into the final heap; when the key
    * cardinality itself is shuffle-hostile (per-token counts over
    * 100 TB of text), this keeps exactly `k` counters per partial
    * aggregate and merges them associatively: add maps pointwise,
    * and while more than k entries survive, subtract the (k+1)-th
    * largest count from every entry and drop the non-positive.
    *
    * Guarantee (delivered, pinned in SketchesSpec): every item with
    * true frequency > n/(k+1) is present, and each stored count c
    * obeys c <= true <= c + n/(k+1). Borderline items BELOW the
    * guarantee line may appear or not depending on merge order — the
    * caller filters by `n/(k+1)` (returned per row as `err_bound`)
    * when it needs the deterministic set.
    *
    * Returns (item, min_count, err_bound) rows, min_count desc. */
  def frequentItems(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val agg = udaf(new MisraGries(k))
    // Null keys are excluded (a null would be rejected as a map key in
    // the MG buffer's output); `__n`, and with it the error guarantee,
    // then covers the non-null population only.
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"))
      .agg(agg(col("__k")).as("mg"), count(lit(1)).as("__n"))
      .select(explode(col("mg")).as(Seq("item", "min_count")), col("__n"))
      .select(col("item"), col("min_count"),
        (col("__n").cast("double") / (k + 1)).as("err_bound"))
      .orderBy(col("min_count").desc, col("item"))
  }

  /** Per-group frequent items: the same O(k)-state summary under a
    * groupBy — per-(group, partition) partials merge map-side, so the
    * shuffle carries one bounded map per group per task (top tokens
    * per domain/language, whatever the within-group cardinality).
    * Guarantee per group: items above n_g/(k+1) of that group's row
    * count present, counts under-estimating by at most n_g/(k+1). */
  def frequentItemsByGroup(
      df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val agg = udaf(new MisraGries(k))
    val g = groupCols.map(col)
    df.filter(col(keyCol).isNotNull)
      .select(g :+ col(keyCol).cast("string").as("__k"): _*)
      .groupBy(g: _*)
      .agg(agg(col("__k")).as("mg"), count(lit(1)).as("__n"))
      .select(g :+ explode(col("mg")).as(Seq("item", "min_count")) :+
        col("__n"): _*)
      .select(g :+ col("item") :+ col("min_count") :+
        (col("__n").cast("double") / (k + 1)).as("err_bound"): _*)
  }
}

/** Mergeable Misra-Gries summary as a typed Aggregator: the buffer is
  * a bounded map of at most k counters, so partial aggregation state
  * is O(k) regardless of key cardinality. */
private[maintain] class MisraGries(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      String, scala.collection.mutable.HashMap[String, Long],
      Map[String, Long]] {
  import scala.collection.mutable.HashMap

  def zero: HashMap[String, Long] = HashMap.empty

  /** Keep at most k entries: subtract the (k+1)-th largest count from
    * every counter and drop the non-positive — the mergeable
    * generalization of the classic decrement-all step. */
  private def shrink(b: HashMap[String, Long]): HashMap[String, Long] = {
    if (b.size <= k) b
    else {
      // (k+1)-th largest; after a single-element insert (size k+1)
      // that is just the minimum — the common reduce path stays O(k)
      val kth =
        if (b.size == k + 1) b.values.min
        else {
          val arr = b.values.toArray
          java.util.Arrays.sort(arr)
          arr(arr.length - (k + 1))
        }
      b.filterInPlace((_, c) => c > kth)
        .mapValuesInPlace((_, c) => c - kth)
    }
  }

  def reduce(b: HashMap[String, Long], a: String): HashMap[String, Long] = {
    b.update(a, b.getOrElse(a, 0L) + 1L)
    shrink(b)
  }

  def merge(x: HashMap[String, Long], y: HashMap[String, Long])
      : HashMap[String, Long] = {
    y.foreach { case (t, c) => x.update(t, x.getOrElse(t, 0L) + c) }
    shrink(x)
  }

  def finish(b: HashMap[String, Long]): Map[String, Long] = b.toMap

  def bufferEncoder
      : org.apache.spark.sql.Encoder[HashMap[String, Long]] =
    org.apache.spark.sql.Encoders.kryo[HashMap[String, Long]]
  def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
