package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.dedup.Dedup

/** Prices the window-cap pairs kernel's SINGLE-HOT-BUCKET regime —
  * the r16 ADVICE straggler concern: one degenerate code cluster
  * (boilerplate frames/pages sharing one fingerprint VERBATIM) in an
  * otherwise healthy corpus. Under the window-cap shape the hot
  * bucket's rows ride the banding exchange into one window task per
  * segment before the cap drops them; the old agg+join-back dropped
  * them map-side before any exchange. This job makes that price a
  * number instead of a comment.
  *
  * Corpus: `n` 56-bit codes; every id % hotMod == 0 carries THE one
  * hot code (hotMod = 0 disables the hot mass — the healthy
  * control), the rest are md5-derived pseudo-random. Arms:
  *
  *   - `direct`: [[Dedup.hammingBandedPairs]] straight over the
  *     codes (the hot bucket saturates every segment; the cap drops
  *     it after the exchange).
  *   - `routed`: [[Dedup.collapseIdenticalCodes]] first — the
  *     production answer the kernel comment prescribes: verbatim
  *     mass folds to one representative before banding, fold edges
  *     carry the cluster — then the same kernel over the reps.
  *
  * Both arms noop-sink the pair frame and report wall + pair count,
  * so a wrong answer cannot masquerade as a fast one. Usage:
  * runMain graft.tools.HotBucketBenchJob [n] [hotMod] [maxBucket]
  * [direct|routed|both]. Prints one JSON line per arm. */
object HotBucketBenchJob {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val hotMod = args.lift(1).map(_.toInt).getOrElse(4)
    val maxBucket = args.lift(2).map(_.toInt).getOrElse(5000)
    val arm = args.lift(3).getOrElse("both")
    require(Set("direct", "routed", "both")(arm),
      s"arm must be direct|routed|both, got '$arm'")
    val spark = Sessions.local("graft-hotbucket-bench")

    val hotCode = lit(0x0123456789ABCL)
    val randCode = expr("abs(xxhash64(cast(id as string))) % " +
      (1L << 56).toString)
    val codes = spark.range(n).select(col("id"),
        (if (hotMod > 0) when(col("id") % hotMod === 0, hotCode)
          .otherwise(randCode)
        else randCode).as("code"))
      .localCheckpoint()
    codes.count()

    def run(name: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      pairs.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cnt = pairs.count()
      println(s"""{"job":"hot_bucket","arm":"$name","n":$n,""" +
        s""""hot_mod":$hotMod,"max_bucket":$maxBucket,""" +
        s""""pairs":$cnt,"wall_s":${f"$wall%.1f"}}""")
    }

    if (arm == "direct" || arm == "both")
      run("direct", Dedup.hammingBandedPairs(codes, maxHamming = 3,
        maxBucket = maxBucket, bits = 56))
    if (arm == "routed" || arm == "both") {
      val (reps, edges) = Dedup.collapseIdenticalCodes(codes)
      run("routed", Dedup.hammingBandedPairs(reps, maxHamming = 3,
          maxBucket = maxBucket, bits = 56)
        .select(col("id_a"), col("id_b"))
        .unionByName(edges))
    }
    spark.stop()
  }
}
