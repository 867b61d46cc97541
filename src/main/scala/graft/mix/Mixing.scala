package graft.mix

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data mixture construction: deterministic weighted
  * sampling of sources into one corpus.
  *
  * Mixtures are specified as a weight per source. Weights <= 1 are
  * downsampling fractions; weights > 1 mean upsampling — emit
  * floor(w) full copies plus a (w - floor(w)) fractional sample.
  * Everything is seed-deterministic: the same inputs and seed produce
  * the same mixture on any cluster (Bernoulli sampling is a pure
  * function of the row position RNG stream), which is what makes
  * training runs reproducible.
  *
  * Scale shape: sample() is a narrow operation (no shuffle); the
  * union is plan-level; repeated copies for upsampling reuse the same
  * scan. Nothing here moves data between executors.
  */
object Mixing {

  /** One source weighted `w`, seed-deterministic.
    *
    * Upsampling (w > 1) is ONE SCAN: each row explodes into
    * ceil(w) copy indices and the last (fractional) copy is kept by a
    * seeded content-hash Bernoulli — not floor(w) unionAll re-scans of
    * the source, which at 100 TB is floor(w) full passes. The
    * content-hash keep (xxhash64 over the row + seed) is deterministic
    * under ANY partitioning or retry, stronger than sample()'s
    * partition-seeded RNG; the one bias — byte-identical duplicate
    * rows share a keep decision — is harmless for upsampling (dup
    * rows are interchangeable) and exact dedupe runs upstream anyway. */
  def weighted(df: DataFrame, w: Double, seed: Long): DataFrame = {
    require(w >= 0, s"weight must be >= 0, got $w")
    val whole = math.floor(w).toInt
    val frac = w - whole
    val hasFrac = frac > 1e-12
    if (w < 1e-12) df.limit(0)
    else if (whole == 0) df.sample(withReplacement = false, frac, seed)
    else {
      val n = whole + (if (hasFrac) 1 else 0)
      val rowHash = xxhash64(struct(df.columns.map(col): _*), lit(seed))
      val keepFrac = pmod(rowHash, lit(1000000L)) <
        lit(math.round(frac * 1000000L))
      df.withColumn("__copy", explode(sequence(lit(1), lit(n))))
        .filter(col("__copy") <= whole || keepFrac)
        .drop("__copy")
    }
  }

  /** Mix several sources into one corpus with per-source weights.
    * Column schemas must align (same as unionAll). */
  def mix(sources: Seq[(DataFrame, Double)], seed: Long = 42L): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    sources.zipWithIndex
      .map { case ((df, w), i) => weighted(df, w, seed + i) }
      .reduce(_ unionAll _)
  }

  /** Stratified sampling by a key column with per-stratum fractions
    * (e.g. balance languages or providers in one table).
    * Seed-deterministic; strata absent from the map are dropped. */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)
}
