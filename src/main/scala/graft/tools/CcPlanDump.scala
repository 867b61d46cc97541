package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.dedup.Dedup

/** Plan-evidence dump for the connected-components star round — the
  * round executes eagerly behind per-round checkpoints inside
  * [[Dedup.connectedComponentsStats]], so NO declared query's plan
  * can show it (the r16 deliverables gap). This prints, over one
  * small edge frame:
  *
  *   1. the r16 round shape, reconstructed verbatim from git history
  *      (groupBy + join-back in both stars) — labeled BEFORE;
  *   2. [[Dedup.starRound]] — the r17 window shape, labeled AFTER.
  *
  * Both formatted plans go to stdout for plans/r17/. The BEFORE body
  * is a reconstruction (the old private lambdas left no handle), kept
  * byte-faithful to commit 5f19470's largeStar/smallStar so the plan
  * artifact is reproducible from source, not hand-written. */
object CcPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-cc-plan-dump")
    import spark.implicits._
    val e = Seq((5L, 1L), (7L, 2L), (7L, 5L), (9L, 3L))
      .toDF("src", "dst").localCheckpoint()

    def largeStarOld(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src"))
        .agg(min(least(col("dst"), col("src"))).as("m"))
      sym.join(mins, Seq("src"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
    }
    def smallStarOld(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val rewired = e.join(mins, Seq("src"))
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
      rewired.union(mins.select(col("src"), col("m").as("dst"))).distinct()
    }

    println("========== cc_star_round BEFORE (r16 groupBy+join-back, " +
      "reconstructed from 5f19470) ==========")
    smallStarOld(largeStarOld(e)).explain("formatted")
    println("========== cc_star_round AFTER (r17 Dedup.starRound, " +
      "window min) ==========")
    Dedup.starRound(e).explain("formatted")
    spark.stop()
  }
}
