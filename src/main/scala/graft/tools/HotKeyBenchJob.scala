package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.dedup.Dedup

/** Prices the r14 keeper-fold rewrite on the corpus it was built
  * for: `n` documents of which 25% are VERBATIM COPIES of one
  * boilerplate page (the classic web-corpus hot digest — error
  * pages, cookie banners, template shells duplicated millions of
  * times), the rest unique. Runs [[Dedup.exactByContent]] (the
  * shipped groupBy-min fold) and the pre-r14 keeper-window replica
  * (row_number over partitionBy(digest) — kept HERE, measurement-
  * only, as the comparison arm) on the same checkpointed input and
  * reports both walls plus the planted keep-count so a wrong answer
  * can't masquerade as a fast one. The window arm funnels every hot
  * copy into ONE task's sort; the fold reaches the exchange as one
  * row per digest per map partition.
  *
  * Usage: runMain graft.tools.HotKeyBenchJob [n] [hotMod]
  * [fold|window|both] — every id % hotMod == 0 row is a copy
  * (default 4 -> 25%); the third arg picks which arm(s) run and is
  * how the matrix's single-arm failure points were measured (the
  * window arm must run ALONE to attribute its OOM). Prints one JSON
  * line per arm run.
  */
object HotKeyBenchJob {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val hotMod = args.lift(1).map(_.toInt).getOrElse(4)
    val arm = args.lift(2).getOrElse("both")
    require(Set("fold", "window", "both")(arm),
      s"arm must be fold|window|both, got '$arm'")
    val spark = Sessions.local("graft-hotkey-bench")

    val boiler = "this page could not be found please check the " +
      "address or return to the home page " * 4
    val docs = spark.range(n).select(col("id"),
        when(col("id") % hotMod === 0, lit(boiler))
          .otherwise(concat(lit("unique document "),
            md5(col("id").cast("string")))).as("text"))
      .localCheckpoint()
    docs.count()
    val hot = (n + hotMod - 1) / hotMod // ids 0, hotMod, ... < n
    val expected = n - hot + 1

    val t0 = System.nanoTime()
    val foldKept = if (arm == "window") -1L
      else Dedup.exactByContent(docs, "id", "text").count()
    val foldWall = (System.nanoTime() - t0) / 1e9

    // pre-r14 arm: the keeper window, verbatim as it shipped
    val t1 = System.nanoTime()
    if (arm == "fold") {
      // require BEFORE printing: a wrong keeper count must never
      // emit a normal-looking measurement line
      require(foldKept == expected, s"fold=$foldKept expected=$expected")
      println(s"""{"metric":"hotkey_bench","docs":$n,"arm":"fold",""" +
        s""""hot_copies":$hot,"kept":$foldKept,""" +
        s""""fold_wall_s":${f"$foldWall%.2f"}}""")
      spark.stop(); return
    }
    val w = Window.partitionBy(col("__h")).orderBy(col("id"))
    val winKept = docs
      .withColumn("__h", Dedup.contentDigestOf(col("text")))
      .withColumn("__rn",
        when(col("__h").isNull, lit(1)).otherwise(row_number().over(w)))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
      .count()
    val winWall = (System.nanoTime() - t1) / 1e9

    require(winKept == expected,
      s"window keeper mismatch: $winKept expected=$expected")
    if (arm == "window") {
      // window-only: report ONLY what ran — a fabricated fold_wall
      // of ~0 ns would otherwise read as an absurd speedup
      println(s"""{"metric":"hotkey_bench","docs":$n,"arm":"window",""" +
        s""""hot_copies":$hot,"kept":$winKept,""" +
        s""""window_wall_s":${f"$winWall%.2f"}}""")
      spark.stop(); return
    }
    require(foldKept == expected,
      s"fold keeper mismatch: $foldKept expected=$expected")
    println(s"""{"metric":"hotkey_bench","docs":$n,""" +
      s""""hot_copies":$hot,"kept":$foldKept,""" +
      s""""fold_wall_s":${f"$foldWall%.2f"},""" +
      s""""window_wall_s":${f"$winWall%.2f"},""" +
      s""""speedup":${f"${winWall / foldWall}%.2f"}}""")
    spark.stop()
  }
}
