package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.similarity.Similarity

/** Timed semantic-dedup run over a testdata embeddings table — the
  * scale measurement for [[graft.similarity.Similarity.semanticDedup]]:
  * with auto-sized clusters (ceil(N/targetCell)) the within-cell pair
  * volume is N x targetCell / 2, so wall should scale ~linearly in
  * rows — compare the sfDir run against a ScaleUp'd Nx copy and the
  * ratio reads the claim directly. Args: <sfDir> [threshold=0.35].
  * Prints ONE JSON line: rows, auto cell count, survivors, dropped,
  * wall seconds. */
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
    println(s"""{"rows":$n,"cells":$cells,"threshold":$threshold,""" +
      s""""survivors":$survivors,"dropped":${n - survivors},""" +
      f""""wall_s":$wall%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
