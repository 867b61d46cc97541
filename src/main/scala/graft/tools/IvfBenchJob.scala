package graft.tools

import org.apache.spark.sql.functions.col

import graft.{Sessions, Tables}
import graft.jobs.AdmissionIndexes
import graft.similarity.Similarity

/** Timed IVF retrieval, both faces of the index story:
  * `inline_s` runs [[Similarity.ivfTopK]] (refit + full base
  * re-assignment on EVERY call — the one-shot exploration face);
  * `index_build_s` fits + assigns + persists once
  * ([[Similarity.ivfIndex]] -> cell-bucketed assignments + centroid
  * table); `probe_s` answers the same queries from the persisted
  * tables alone ([[Similarity.ivfTopKFromIndex]] — the standing-index
  * face: no refit, no base-side work, bucket-pruned candidate scan).
  * Probe results are checked equal to the inline run (deterministic
  * fit => identical centroids => identical answers), and
  * `append_s` times one [[Similarity.ivfAssign]]+append batch —
  * the steady-state ingest cost. A 5th arg `pq` switches to the
  * IVF-PQ family ([[graft.similarity.Pq]]): same faces, but the
  * persisted index is codes-only (m=16, kCodes=32, refine=16) —
  * `index_bytes` reports the stored assignments' size, the PQ
  * memory claim measured.
  * Args: <embDir or sfDir> [k=10] [nLists=64] [nProbe=8] [pq]. */
object IvfBenchJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfBenchJob <sfDir> [k] [nLists] [nProbe] [pq]")
    val sfDir = args(0)
    val k = if (args.length >= 2) args(1).toInt else 10
    val nLists = if (args.length >= 3) args(2).toInt else 64
    val nProbe = if (args.length >= 4) args(3).toInt else 8
    val pqMode = args.length >= 5 && args(4) == "pq"
    val spark = Sessions.local("graft-ivfbench")
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint()
    val base = emb.filter(col("vec_id") >= 32)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val nBase = base.count()

    def shaped(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    if (pqMode) {
      import graft.similarity.Pq
      val (m, kCodes, refine) = (16, 32, 16)
      val t0 = System.nanoTime()
      val inline = shaped(Pq.ivfPqTopK(queries, base, k,
        nLists = nLists, nProbe = nProbe, m = m, kCodes = kCodes,
        refine = refine).collect())
      val tInline = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val (cents, cbDf, assigned) = Pq.ivfPqIndex(base,
        nLists = nLists, m = m, kCodes = kCodes)
      AdmissionIndexes.saveIvfIndex(assigned, "ivfpq_bench", buckets = 32)
      AdmissionIndexes.saveIvfCentroids(cents, "ivfpq_bench_cents")
      AdmissionIndexes.savePqCodebooks(cbDf, "ivfpq_bench_cb")
      val tBuild = (System.nanoTime() - t1) / 1e9

      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val indexBytes = Option(
        new java.io.File(wh, "ivfpq_bench").listFiles())
        .map(_.filter(_.getName.startsWith("part-")).map(_.length).sum)
        .getOrElse(0L)

      val t2 = System.nanoTime()
      val probed = shaped(Pq.ivfPqTopKFromIndex(queries,
        AdmissionIndexes.load(spark, "ivfpq_bench"),
        AdmissionIndexes.load(spark, "ivfpq_bench_cents"),
        AdmissionIndexes.load(spark, "ivfpq_bench_cb"),
        base, k, nProbe = nProbe, refine = refine).collect())
      val tProbe = (System.nanoTime() - t2) / 1e9
      require(probed == inline,
        "persisted IVF-PQ probe diverged from the inline fit")

      println(s"""{"mode":"ivfpq","base":$nBase,"k":$k,""" +
        s""""n_lists":$nLists,"n_probe":$nProbe,"m":$m,""" +
        s""""inline_s":${f"$tInline%.2f"},""" +
        s""""index_build_s":${f"$tBuild%.2f"},""" +
        s""""probe_s":${f"$tProbe%.2f"},""" +
        s""""index_bytes":$indexBytes,""" +
        s""""probe_speedup":${f"${tInline / tProbe}%.1f"},""" +
        s""""match":true,"sf":"$sfDir"}""")
      spark.stop()
      return
    }

    val t0 = System.nanoTime()
    val inline = shaped(Similarity.ivfTopK(queries, base, k,
      nLists = nLists, nProbe = nProbe).collect())
    val tInline = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val (cents, assigned) = Similarity.ivfIndex(base, nLists = nLists)
    AdmissionIndexes.saveIvfIndex(assigned, "ivf_bench", buckets = 32)
    AdmissionIndexes.saveIvfCentroids(cents, "ivf_bench_cents")
    val tBuild = (System.nanoTime() - t1) / 1e9

    val idx = AdmissionIndexes.load(spark, "ivf_bench")
    val centsT = AdmissionIndexes.load(spark, "ivf_bench_cents")
    val t2 = System.nanoTime()
    val probed = shaped(Similarity.ivfTopKFromIndex(queries, idx, centsT,
      k, nProbe = nProbe).collect())
    val tProbe = (System.nanoTime() - t2) / 1e9
    require(probed == inline,
      "persisted-index probe diverged from the inline fit")

    // steady-state ingest: one 1000-vector batch coded against the
    // STORED centroids and appended under the same bucket spec
    val batch = emb.filter(col("vec_id") >= 32 && col("vec_id") < 1032)
      .select((col("vec_id") + 10000000L).as("id"),
        col("embedding").as("vec"))
    val stored = Similarity.loadedCentroids(centsT)
    val t3 = System.nanoTime()
    AdmissionIndexes.saveIvfIndex(Similarity.ivfAssign(batch, stored),
      "ivf_bench", buckets = 32, append = true)
    val tAppend = (System.nanoTime() - t3) / 1e9

    println(s"""{"base":$nBase,"k":$k,"n_lists":$nLists,""" +
      s""""n_probe":$nProbe,"inline_s":${f"$tInline%.2f"},""" +
      s""""index_build_s":${f"$tBuild%.2f"},""" +
      s""""probe_s":${f"$tProbe%.2f"},""" +
      s""""append_s":${f"$tAppend%.2f"},""" +
      s""""probe_speedup":${f"${tInline / tProbe}%.1f"},""" +
      s""""match":true,"sf":"$sfDir"}""")
    spark.stop()
  }
}
