package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.jobs.AdmissionIndexes
import graft.similarity.Similarity

/** Timed semantic-dedup run over a testdata embeddings table — the
  * scale measurement for [[graft.similarity.Similarity.semanticDedup]]:
  * with auto-sized clusters (ceil(N/targetCell)) the within-cell pair
  * volume is N x targetCell / 2, so wall should scale ~linearly in
  * rows — compare the sfDir run against a ScaleUp'd Nx copy and the
  * ratio reads the claim directly.
  *
  * Also times the FIT-ONCE/ASSIGN-FOREVER face: build + persist a
  * cell-bucketed single-assignment IVF index once
  * ([[Similarity.ivfIndex]] -> [[AdmissionIndexes.saveIvfIndex]]),
  * then run [[Similarity.semanticDedupFromAssignments]] COLD off the
  * persisted table — the shape a standing 100-TB corpus runs, where
  * the quantizer is fitted once and every later dedup pass (or
  * appended batch) reuses the stored cells. `index_build_s` is the
  * one-time cost; `from_index_wall_s` is the steady-state pass, which
  * skips the fit AND the assignment scan.
  *
  * Args: <sfDir> [threshold=0.35].
  * Prints ONE JSON line: rows, auto cell count, survivors, dropped,
  * inline wall, index build wall, from-index wall + survivors. */
object SemDedupBenchJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SemDedupBenchJob <sfDir> [threshold]")
    val sfDir = args(0)
    val threshold = if (args.length >= 2) args(1).toDouble else 0.35
    val spark = Sessions.local("graft-semdedup-bench")
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = emb.count()
    val cells = Similarity.autoCells(n)
    val t0 = System.nanoTime()
    val survivors = Similarity.semanticDedup(emb, threshold).count()
    val wall = (System.nanoTime() - t0) / 1e9

    // fit-once/assign-forever: persist the cell-bucketed index, then
    // dedup off the stored assignments with no refit/re-assignment
    val t1 = System.nanoTime()
    val (cents, assignments) =
      Similarity.ivfIndex(emb, nLists = cells, nAssign = 1)
    AdmissionIndexes.saveIvfIndex(assignments, "semdedup_bench_ivf",
      buckets = 64)
    AdmissionIndexes.saveIvfCentroids(cents, "semdedup_bench_cents")
    val buildWall = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val fromIdx = Similarity.semanticDedupFromAssignments(
      spark.table("semdedup_bench_ivf"), threshold).count()
    val fromIdxWall = (System.nanoTime() - t2) / 1e9

    println(s"""{"rows":$n,"cells":$cells,"threshold":$threshold,""" +
      s""""survivors":$survivors,"dropped":${n - survivors},""" +
      f""""wall_s":$wall%.2f,"index_build_s":$buildWall%.2f,""" +
      s""""from_index_survivors":$fromIdx,""" +
      f""""from_index_wall_s":$fromIdxWall%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
