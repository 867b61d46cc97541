package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.dedup.Dedup

/** Convergence measurement for the star-contraction connected
  * components kernel: builds a path graph of the given diameter (the
  * worst case for any label-propagation scheme — one-hop min-label
  * needs exactly `diameter` rounds on it), runs
  * [[Dedup.connectedComponentsStats]], and reports rounds + wall +
  * the cluster check (a path is ONE component; anything else is a
  * correctness failure, not a perf number). Args: [diameter=100000]
  * [reliable] — the literal flag sets a SparkContext checkpoint dir
  * first, so every round goes through the RELIABLE
  * [[graft.Checkpoints.iter]] path (persist -> checkpoint ->
  * unpersist) and the run prices the fault-tolerance premium vs the
  * default executor-local blocks. Prints ONE JSON line per kernel. */
object CcBenchJob {
  def main(args: Array[String]): Unit = {
    val reliable = args.contains("reliable")
    val pos = args.filterNot(_ == "reliable")
    val d = if (pos.nonEmpty) pos(0).toInt else 100000
    val spark = Sessions.local("graft-ccbench")
    if (reliable)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("ccbench_ckpt").toString)
    import spark.implicits._
    // path 0-1-...-d: d edges, diameter d, generated distributed
    val pairs = spark.range(0, d.toLong)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val t0 = System.nanoTime()
    val (labels, rounds) =
      Dedup.connectedComponentsStats(pairs, "id_a", "id_b")
    val clusters = labels.select(countDistinct(col("cluster"))).collect()(0)
      .getLong(0)
    val wallS = (System.nanoTime() - t0) / 1e9
    require(clusters == 1L, s"path split into $clusters clusters")
    val bound = 2 * (math.log(d.toDouble) / math.log(2.0))
    println(s"""{"kernel":"large_star_small_star","diameter":$d,""" +
      s""""rounds":$rounds,"bound_2log2d":${f"$bound%.1f"},""" +
      s""""one_hop_rounds_would_be":$d,"clusters":$clusters,""" +
      s""""checkpoint":"${if (reliable) "reliable" else "local"}",""" +
      s""""wall_s":${f"$wallS%.1f"}}""")

    // incremental fold: a 1%-of-V batch of fresh pairs (half pair
    // new nodes into existing clusters, half are new-node chains)
    // folded into the standing labels — the per-batch cost of the
    // growing-corpus clustering path, vs the full recompute above.
    // (`labels` is already checkpoint-backed by the kernel and
    // materialized by the count above — no extra copy needed.)
    val k = math.max(d / 100, 10).toLong
    val batch = spark.range(0, k)
      .select((col("id") * 37 % (d + 1)).as("id_a"),
        (col("id") + d + 1).as("id_b"))
      .union(spark.range(0, k)
        .select((col("id") + d + 1).as("id_a"),
          (col("id") + d + 1 + k).as("id_b")))
    val t1 = System.nanoTime()
    val (incLabels, incRounds) =
      Dedup.incrementalConnectedComponentsStats(
        labels, batch, "id_a", "id_b")
    val incClusters = incLabels.select(countDistinct(col("cluster")))
      .collect()(0).getLong(0)
    val incWall = (System.nanoTime() - t1) / 1e9
    require(incClusters == 1L, s"fold split into $incClusters clusters")
    println(s"""{"kernel":"incremental_fold","prev_nodes":${d + 1},""" +
      s""""batch_pairs":${2 * k},"rounds":$incRounds,""" +
      s""""clusters":$incClusters,"wall_s":${f"$incWall%.1f"}}""")
    spark.stop()
  }
}
