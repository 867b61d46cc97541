package graft.tools

import org.apache.spark.sql.functions.col

import graft.{Sessions, Tables}
import graft.jobs.{AdmissionIndexes, CorpusPipeline}

/** Timed steady-state admission run — the growing-corpus path
  * ([[CorpusPipeline.admitBatch]]) end-to-end at scale: a small
  * arriving batch is admitted against a large curated corpus through
  * its PERSISTED digest + band indexes. The measurement separates
  * `index_build_s` (one-time corpus indexing — at real scale these
  * tables are LOADED, not built, so this cost amortizes over every
  * future batch) from `admit_s` (the recurring per-batch cost the
  * steady state actually pays — the number that must stay small as
  * the corpus grows). Args: <sfDir> [batchMod=101] [layout] (docs
  * with doc_id % batchMod == 0 form the batch, the rest the corpus;
  * `layout` = `checkpoint` (default — in-memory index blocks),
  * `bucketed` — indexes written and re-read through
  * [[graft.jobs.AdmissionIndexes]]' probe-key-bucketed tables, the
  * persisted layout a real deployment loads, where the index side of
  * the probe joins needs no exchange — or `bootstrap`, which builds
  * ALL five text-derived tables in one job off one checkpointed
  * corpus scan ([[graft.jobs.AdmissionIndexes.bootstrap]]) so the
  * day-0 cost can be compared against the separate per-index
  * builds). */
object AdmissionBenchJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: AdmissionBenchJob <sfDir> [batchMod] [checkpoint|bucketed]")
    val sfDir = args(0)
    val batchMod = if (args.length >= 2) args(1).toInt else 101
    val layout = if (args.length >= 3) args(2) else "checkpoint"
    require(Set("checkpoint", "bucketed", "bootstrap")(layout),
      s"layout must be checkpoint, bucketed, or bootstrap, got '$layout'")
    val spark = Sessions.local("graft-admitbench")
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % batchMod =!= 0)
      .localCheckpoint()
    val batch = docs.filter(col("doc_id") % batchMod === 0)
      .localCheckpoint()
    val nCorpus = corpus.count()
    val nBatch = batch.count()

    val t0 = System.nanoTime()
    val (corpusDigests, corpusBands) = layout match {
      case "bootstrap" =>
        // ALL five text-derived tables in one job off one checkpointed
        // corpus scan — the day-0 build the incremental family
        // assumes; compare index_build_s + window_index_build_s here
        // against the bucketed mode's separate builds. rowsPerBand=2
        // EXPLICITLY: the probe below runs at 2, and a default-built
        // (rowsPerBand=4) index would hash a disjoint band-key space —
        // the stamp + loadBandIndex turn that mismatch into a refusal
        // instead of a silently-admitting measurement.
        AdmissionIndexes.bootstrap(corpus, "doc_id", "text",
          "admitbench_boot", shingleN = 3, bands = 8, rowsPerBand = 2)
        (AdmissionIndexes.load(spark, "admitbench_boot_digests"),
          AdmissionIndexes.loadBandIndex(spark, "admitbench_boot_bands",
            shingleN = 3, bands = 8, rowsPerBand = 2))
      case "bucketed" =>
        // The deployment shape: indexes land in probe-key-bucketed
        // tables once, and every subsequent batch's probe joins read
        // them shuffle-free on the index side. index_build_s here
        // includes the bucketed write (one-time); admit_s probes the
        // RELOADED tables, which is what steady state pays.
        AdmissionIndexes.saveDigestIndex(
          graft.dedup.Dedup.contentDigests(corpus, "doc_id", "text"),
          "admitbench_digest_idx")
        AdmissionIndexes.saveBandIndex(
          graft.dedup.Dedup.minhashBandRows(corpus, "doc_id", "text",
            shingleN = 3, bands = 8, rowsPerBand = 2),
          "admitbench_band_idx", shingleN = 3, bands = 8,
          rowsPerBand = 2)
        (AdmissionIndexes.load(spark, "admitbench_digest_idx"),
          AdmissionIndexes.loadBandIndex(spark, "admitbench_band_idx",
            shingleN = 3, bands = 8, rowsPerBand = 2))
      case _ =>
        (graft.dedup.Dedup.contentDigests(corpus, "doc_id", "text")
          .localCheckpoint(),
          graft.dedup.Dedup.minhashBandRows(corpus, "doc_id", "text",
            shingleN = 3, bands = 8, rowsPerBand = 2).localCheckpoint())
    }
    val nBands = corpusBands.count()
    val tIndex = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val adm = CorpusPipeline.admitBatch(corpus, corpusDigests, corpusBands,
      batch, "doc_id", "text", shingleN = 3, bands = 8, rowsPerBand = 2,
      threshold = 0.3)
    val nAdmitted = adm.admitted.count()
    val nDeltaDigests = adm.newDigests.count()
    val tAdmit = (System.nanoTime() - t1) / 1e9

    // the folded strip + postings pass: same admission, with the
    // window index probed and the retrieval deltas built in the same
    // job. admit_full_s - admit_s prices what maintaining strip +
    // BM25 state costs WHEN it rides the admission pass (vs two
    // extra standalone jobs that would each re-read the batch).
    val tw = System.nanoTime()
    val corpusWindows = layout match {
      case "bootstrap" => // already built by the one-pass bootstrap
        AdmissionIndexes.load(spark, "admitbench_boot_windows")
      case "bucketed" =>
        AdmissionIndexes.saveWindowIndex(
          graft.dedup.Dedup.windowDigestSet(corpus, "doc_id", "text"),
          "admitbench_window_idx")
        AdmissionIndexes.load(spark, "admitbench_window_idx")
      case _ =>
        graft.dedup.Dedup.windowDigestSet(corpus, "doc_id", "text")
          .localCheckpoint()
    }
    val nWindows = corpusWindows.count()
    val tWinIndex = (System.nanoTime() - tw) / 1e9
    val t2 = System.nanoTime()
    val admFull = CorpusPipeline.admitBatch(corpus, corpusDigests,
      corpusBands, batch, "doc_id", "text", shingleN = 3, bands = 8,
      rowsPerBand = 2, threshold = 0.3,
      stripWindows = Some(corpusWindows), stripWinLen = 10,
      withPostings = true)
    val nClean = admFull.admittedClean.get.count()
    val nNewWindows = admFull.newWindows.get.count()
    val nNewPostings = admFull.newPostings.get.count()
    val tAdmitFull = (System.nanoTime() - t2) / 1e9

    val dec = adm.decisions.map(d =>
      s"""{"stage":"${d.stage}","decision":"${d.decision}"}""")
      .mkString("[", ",", "]")
    println(s"""{"corpus":$nCorpus,"batch":$nBatch,""" +
      s""""index_rows":$nBands,"index_build_s":${f"$tIndex%.2f"},""" +
      s""""admitted":$nAdmitted,"delta_digests":$nDeltaDigests,""" +
      s""""admit_s":${f"$tAdmit%.2f"},""" +
      s""""window_index_rows":$nWindows,""" +
      s""""window_index_build_s":${f"$tWinIndex%.2f"},""" +
      s""""admit_full_s":${f"$tAdmitFull%.2f"},""" +
      s""""clean_rows":$nClean,"delta_windows":$nNewWindows,""" +
      s""""delta_postings":$nNewPostings,"layout":"$layout",""" +
      s""""decisions":$dec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
