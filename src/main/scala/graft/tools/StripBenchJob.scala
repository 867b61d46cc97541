package graft.tools

import org.apache.spark.sql.functions.{col, sum}

import graft.{Sessions, Tables}
import graft.dedup.Dedup

/** Timed incremental passage strip — the growing-corpus path of
  * [[graft.dedup.Dedup.incrementalStripPassages]] end-to-end: a small
  * arriving batch is stripped against a large corpus's window-digest
  * index. Separates `index_build_s` (one-time corpus window hashing —
  * at real scale this SET is loaded, not built) from `strip_s` (the
  * recurring per-batch cost: batch-only hashing + one probe join
  * against 32-char digests — the number that must stay flat as the
  * corpus grows, because corpus TEXT is never re-read). Args:
  * <sfDir> [batchMod=101] [winLen=10] (docs with doc_id % batchMod
  * == 0 form the batch, the rest the corpus; winLen sets the passage
  * granularity — 10 is sentence-ish, 50 paragraph-ish: larger
  * windows mean ~winLen-fold fewer digest rows per token, so the
  * index and the keeper aggregate shrink while the per-window hash
  * concat grows). */
object StripBenchJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: StripBenchJob <sfDir> [batchMod] [winLen]")
    val sfDir = args(0)
    val batchMod = if (args.length >= 2) args(1).toInt else 101
    val winLen = if (args.length >= 3) args(2).toInt else 10
    val spark = Sessions.local("graft-stripbench")
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % batchMod =!= 0)
      .localCheckpoint()
    val batch = docs.filter(col("doc_id") % batchMod === 0)
      .localCheckpoint()
    val nCorpus = corpus.count()
    val nBatch = batch.count()

    val t0 = System.nanoTime()
    val idx = Dedup.windowDigestSet(corpus, "doc_id", "text", winLen)
      .localCheckpoint()
    val nIdx = idx.count()
    val tIndex = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val res = Dedup.incrementalStripPassages(idx, batch, "doc_id",
      "text", winLen)
    val agg = res.cleaned.agg(sum(col("n_dropped"))).collect()(0)
    val nDropped = if (agg.isNullAt(0)) 0L else agg.getLong(0)
    val nNewWindows = res.newWindows.count()
    val tStrip = (System.nanoTime() - t1) / 1e9

    println(s"""{"corpus":$nCorpus,"batch":$nBatch,"win_len":$winLen,""" +
      s""""index_windows":$nIdx,"index_build_s":${f"$tIndex%.2f"},""" +
      s""""windows_dropped":$nDropped,"new_windows":$nNewWindows,""" +
      s""""strip_s":${f"$tStrip%.2f"},"sf":"$sfDir"}""")
    spark.stop()
  }
}
