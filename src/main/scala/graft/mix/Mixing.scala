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

  /** One source weighted `w`, seed-deterministic. */
  def weighted(df: DataFrame, w: Double, seed: Long): DataFrame = {
    require(w >= 0, s"weight must be >= 0, got $w")
    val whole = math.floor(w).toInt
    val frac = w - whole
    val copies = Seq.fill(whole)(df) ++
      (if (frac > 1e-12) Seq(df.sample(withReplacement = false, frac, seed))
       else Nil)
    copies match {
      case Nil => df.limit(0)
      case head +: tail => tail.foldLeft(head)(_ unionAll _)
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
