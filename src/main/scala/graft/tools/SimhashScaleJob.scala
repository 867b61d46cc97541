package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.dedup.Dedup

/** Timed simhash near-dup run at corpus scale — the measurement that
  * gives the documented "64-bit is the real scale path" claim a
  * number: at bits=32 and 500k docs the maxHamming=3 segments are 8
  * bits wide (256 values), so segment buckets average ~2k rows and
  * the cap trades recall by the operator's own documentation; at
  * bits=64 the segments are 16-bit (65k values), buckets average ~8
  * rows, and the SAME cap touches (almost) nothing.
  *
  * Recall here is EXACT, not estimated: the capped pair set is a
  * subset of the uncapped one (dropping buckets only removes
  * candidates; the hamming verify is identical), and uncapped
  * pigeonhole banding is provably lossless below the bound — so
  * recall = capped_pairs / uncapped_pairs. The uncapped reference
  * run is opt-in (`uncapped` arg): feasible at 64 bits where buckets
  * are narrow; at 32 bits and 500k docs it is the n²-ish blow-up the
  * cap exists to prevent, so the 32-bit row reports the
  * oversized-bucket monitor (count + mass) as its loss signal
  * instead.
  *
  * Args: <sfDir> [bits=64] [maxHamming=3] [maxBucket=500] [uncapped].
  * Prints ONE JSON line. */
object SimhashScaleJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: SimhashScaleJob <sfDir> [bits] [maxHamming] [maxBucket] [uncapped]")
    val sfDir = args(0)
    val bits = if (args.length >= 2) args(1).toInt else 64
    val maxHamming = if (args.length >= 3) args(2).toInt else 3
    val maxBucket = if (args.length >= 4) args(3).toInt else 500
    val runUncapped = args.length >= 5 && args(4) == "uncapped"
    val spark = Sessions.local("graft-simhash-scale")
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val t0 = System.nanoTime()
    val codes = Dedup.simhashCodes(docs, "doc_id", "text", bits)
      .localCheckpoint()
    val codesWall = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val capped = Dedup.hammingBandedPairs(codes, maxHamming, maxBucket,
      bits).count()
    val cappedWall = (System.nanoTime() - t1) / 1e9
    val over = Dedup.oversizedHammingBuckets(codes, maxHamming,
        maxBucket, bits)
      .agg(count(lit(1)), coalesce(sum(col("bsz")), lit(0L)))
      .collect()(0)
    val (uncapped, uncappedWall, recall) =
      if (!runUncapped) (-1L, -1.0, -1.0)
      else {
        val t2 = System.nanoTime()
        val u = Dedup.hammingBandedPairs(codes, maxHamming,
          Int.MaxValue, bits).count()
        val w = (System.nanoTime() - t2) / 1e9
        (u, w, if (u == 0) 1.0 else capped.toDouble / u)
      }
    println(s"""{"docs":$n,"bits":$bits,"max_hamming":$maxHamming,""" +
      s""""max_bucket":$maxBucket,"pairs_capped":$capped,""" +
      f""""codes_wall_s":$codesWall%.2f,"pairs_wall_s":$cappedWall%.2f,""" +
      s""""oversized_buckets":${over.getLong(0)},""" +
      s""""oversized_mass":${over.getLong(1)},""" +
      s""""pairs_uncapped":$uncapped,""" +
      f""""uncapped_wall_s":$uncappedWall%.2f,"recall":$recall%.4f,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
