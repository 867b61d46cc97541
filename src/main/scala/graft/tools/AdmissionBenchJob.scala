package graft.tools

import org.apache.spark.sql.functions.col

import graft.{Sessions, Tables}
import graft.jobs.CorpusPipeline

/** Timed steady-state admission run — the growing-corpus path
  * ([[CorpusPipeline.admitBatch]]) end-to-end at scale: a small
  * arriving batch is admitted against a large curated corpus through
  * its PERSISTED digest + band indexes. The measurement separates
  * `index_build_s` (one-time corpus indexing — at real scale these
  * tables are LOADED, not built, so this cost amortizes over every
  * future batch) from `admit_s` (the recurring per-batch cost the
  * steady state actually pays — the number that must stay small as
  * the corpus grows). Args: <sfDir> [batchMod=101] (docs with
  * doc_id % batchMod == 0 form the batch, the rest the corpus). */
object AdmissionBenchJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AdmissionBenchJob <sfDir> [batchMod]")
    val sfDir = args(0)
    val batchMod = if (args.length >= 2) args(1).toInt else 101
    val spark = Sessions.local("graft-admitbench")
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % batchMod =!= 0)
      .localCheckpoint()
    val batch = docs.filter(col("doc_id") % batchMod === 0)
      .localCheckpoint()
    val nCorpus = corpus.count()
    val nBatch = batch.count()

    val t0 = System.nanoTime()
    val corpusDigests = graft.dedup.Dedup.contentDigests(
      corpus, "doc_id", "text").localCheckpoint()
    val corpusBands = graft.dedup.Dedup.minhashBandRows(
      corpus, "doc_id", "text", shingleN = 3, bands = 8, rowsPerBand = 2)
      .localCheckpoint()
    val nBands = corpusBands.count()
    val tIndex = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val adm = CorpusPipeline.admitBatch(corpus, corpusDigests, corpusBands,
      batch, "doc_id", "text", shingleN = 3, bands = 8, rowsPerBand = 2,
      threshold = 0.3)
    val nAdmitted = adm.admitted.count()
    val nDeltaDigests = adm.newDigests.count()
    val tAdmit = (System.nanoTime() - t1) / 1e9

    val dec = adm.decisions.map(d =>
      s"""{"stage":"${d.stage}","decision":"${d.decision}"}""")
      .mkString("[", ",", "]")
    println(s"""{"corpus":$nCorpus,"batch":$nBatch,""" +
      s""""index_rows":$nBands,"index_build_s":${f"$tIndex%.2f"},""" +
      s""""admitted":$nAdmitted,"delta_digests":$nDeltaDigests,""" +
      s""""admit_s":${f"$tAdmit%.2f"},"decisions":$dec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
