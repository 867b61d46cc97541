package graft.maintain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot-key joins and aggregations.
  *
  * At 100 TB a handful of hot keys (one provider with 314 M rows —
  * docs/cc-catalog.md:205 — joining against per-provider dims) can
  * pin a whole stage on one task. AQE's skew-join split handles the
  * sort-merge case at runtime; salting is the explicit fix when the
  * aggregation itself is skewed or AQE can't split (e.g.
  * first-aggregate-then-join patterns).
  */
object Skew {

  /** Two-phase salted aggregation: count-like/associative aggregates
    * group first on (key, salt) — spreading one hot key over
    * `saltBuckets` reducers — then re-aggregate on the key alone.
    * `partials` maps each (aggregated) column to its re-combine
    * expression; e.g. a count becomes sum-of-partial-counts. */
  def saltedAgg(
      df: DataFrame,
      keyCol: String,
      saltBuckets: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    // Salt from a hash of the row's own columns: deterministic under
    // task retry (monotonically_increasing_id / spark_partition_id
    // change when a lost task re-runs, which can double-count rows
    // mid-shuffle). Identical rows sharing a salt is harmless for
    // associative partial aggregates.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets.toLong)))
    val partial = salted.groupBy(col(keyCol), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(col(keyCol))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast-style join for a skewed fact against a small
    * dim when the dim must NOT be broadcast (e.g. too wide): the fact
    * side gets a random salt in [0, n); the dim side is exploded n
    * ways; the join key becomes (key, salt) — no single reducer owns
    * a hot key. For genuinely small dims prefer broadcast(); this is
    * the pattern for the middle ground. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(saltBuckets.toLong)))
    val explodedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
