package graft.mix

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-group quota sampling: exactly the first `n` rows
  * of each group under a content-hash order — "balance the corpus to
  * N documents per language" with no RNG, reproducible on any cluster
  * and any partitioning (same spirit as [[Splits]]).
  *
  * Scale shape: a naive `row_number().over(partitionBy(group))` sorts
  * every group through ONE task — with 5 languages over 100 TB that
  * is 5 tasks doing all the work. This runs TWO phases: phase 1 ranks
  * within (group, salt-of-order-key) — `salts`x the parallelism, each
  * partition keeps its local top-n — and phase 2 ranks the surviving
  * <= n*salts rows per group, which is bounded driver-independent
  * work. Because the order key is a total order, local-top-n then
  * global-top-n is exactly global-top-n: the result is identical to
  * the naive form (QuotaSpec proves parity), only the plan differs.
  */
object Quota {

  /** Hash order key for quota decisions: md5 of the row key + a salt
    * tag, so quota membership is independent of [[Splits.assign]]'s
    * buckets (different tag -> independent hash). */
  def orderKey(key: Column, tag: String = "quota"): Column =
    md5(concat(key.cast("string"), lit(":" + tag)))

  /** Keep the first `n` rows of each group by `ord` (a deterministic,
    * unique-per-row Column). Emits every kept row + its final rank. */
  def topNPerGroup(
      df: DataFrame,
      groupCol: String,
      ord: Column,
      n: Int,
      salts: Int = 16): DataFrame = {
    require(n > 0 && salts > 0, s"need n>0, salts>0; got n=$n salts=$salts")
    val local = Window
      .partitionBy(col(groupCol), pmod(xxhash64(ord), lit(salts)))
      .orderBy(col("__ord"))
    val global = Window.partitionBy(col(groupCol)).orderBy(col("__ord"))
    df.withColumn("__ord", ord)
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= n) // phase 1: <= n survivors per salt
      .withColumn("rnk", row_number().over(global)) // phase 2: bounded
      .filter(col("rnk") <= n)
      .drop("__ord", "__lr")
  }
}
