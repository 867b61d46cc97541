package graft.tools

import org.apache.spark.sql.functions.col

import graft.{Sessions, Tables}
import graft.jobs.CorpusPipeline
import graft.text.TextStats

/** Timed end-to-end corpus-pipeline run over a testdata documents
  * table — the measurement for the COMPOSITION (quality -> exact ->
  * near-dup -> decontaminate -> redact -> split -> pack), whose
  * stages are audited individually but whose orchestration
  * (checkpoint placement, flag-frame joins, skew-guard decision)
  * only shows its cost end-to-end. Args: <sfDir>.
  *
  * Per-stage walls come from the pipeline's own `onStage` marks
  * (each stage's flag frame is eagerly checkpointed, so the mark
  * deltas are real materialization costs); `finalize_s` is the
  * remainder — redact/split/pack plus the provenance assembly the
  * final counts force.
  *
  * docs >= 10 form the corpus, docs < 10 the decontamination
  * benchmark. The quality gate is the fixture-appropriate length
  * rule (the synthetic corpus has no English stopwords, so the
  * default Gopher gate would empty the pipeline and the measurement
  * would time nothing — CorpusPipelineSpec documents the same).
  *
  * Args: <sfDir> [embDir] [strip]. With `embDir`, the near-dup stage
  * runs the EMBEDDINGS pair source instead of token LSH (that dir's
  * embeddings table joined on vec_id = doc_id, cosine >= 0.95) —
  * different kernels entirely (sign-code self-join + pipelined
  * cosine verify), so its per-stage cost is its own measurement.
  * With the literal flag `strip`, the optional passage-strip stage
  * runs over the survivors (winLen 10); its cost lands in
  * `finalize_s`, so the with/without delta at the same sfDir is the
  * stage's end-to-end price. With `tokenize[:nMerges]` (default
  * 256), a BPE vocab is trained on the corpus first (`bpe_train_s`,
  * one-time — at real scale the vocab is an artifact, not retrained
  * per run) and the pipeline encodes with it — combined with
  * `strip` this is the PRODUCTION order: dedup -> strip -> redact ->
  * encode -> pack, priced as one composed run. */
object PipelineBenchJob {
  def main(args: Array[String]): Unit = {
    val strip = args.contains("strip")
    val tokArg = args.find(a => a == "tokenize" || a.startsWith("tokenize:"))
    val nMerges = tokArg.filter(_.startsWith("tokenize:")).map { s =>
      val n = s.stripPrefix("tokenize:")
      require(n.nonEmpty && n.forall(_.isDigit),
        s"bad flag '$s' — usage: tokenize[:nMerges]")
      n.toInt
    }.getOrElse(256)
    val pos = args.filterNot(a => a == "strip" || a == tokArg.orNull)
    require(pos.length >= 1 && pos.length <= 2,
      "usage: PipelineBenchJob <sfDir> [embDir] [strip] [tokenize[:n]]")
    val sfDir = pos(0)
    val spark = Sessions.local("graft-pipebench")
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") >= 10)
    val bench = docs.filter(col("doc_id") < 10)
    val (srcName, pairSource) =
      if (pos.length == 2) {
        val emb = Tables.embeddings(spark, pos(1))
        ("embeddings", CorpusPipeline.PairSource.Embeddings(
          emb, simThreshold = 0.95,
          embIdCol = "vec_id", vecCol = "embedding"))
      } else ("token_lsh", CorpusPipeline.PairSource.TokenLsh)

    // vocab trained BEFORE the timed pipeline run: at real scale the
    // tokenizer is a versioned artifact the pipeline loads
    val tTrain = System.nanoTime()
    val merges = tokArg.map { _ =>
      graft.text.Bpe.train(corpus, "text", numMerges = nMerges,
        minPairCount = 2, checkpointEvery = 4, batch = 16).merges
    }
    val tBpe = (System.nanoTime() - tTrain) / 1e9

    val stageWalls =
      scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val t0 = System.nanoTime()
    val res = CorpusPipeline.run(corpus, "doc_id", "text", bench,
      shardBudget = 4096L,
      pairSource = pairSource,
      quality = t => TextStats.tokenCount(t) >= 10,
      onStage = (s, w) => stageWalls(s) = w,
      tokenizerMerges = merges,
      stripPassages = if (strip) Some(10) else None)
    val s = CorpusPipeline.stats(res.annotated).collect().head
    val cleanedRows = res.cleaned.count()
    val wall = (System.nanoTime() - t0) / 1e9
    stageWalls("finalize") = wall - stageWalls.values.sum

    val dec = res.decisions.map(d =>
      s"""{"stage":"${d.stage}","decision":"${d.decision}","detail":"${d.detail}"}""")
      .mkString("[", ",", "]")
    val stagesJson = stageWalls
      .map { case (k, v) => s""""$k":${f"$v%.2f"}""" }
      .mkString("{", ",", "}")
    println(s"""{"input":${s.getAs[Long]("input")},""" +
      s""""quality_fail":${s.getAs[Long]("quality_fail")},""" +
      s""""exact_dup":${s.getAs[Long]("exact_dup")},""" +
      s""""near_dup":${s.getAs[Long]("near_dup")},""" +
      s""""contaminated":${s.getAs[Long]("contaminated")},""" +
      s""""kept":${s.getAs[Long]("kept")},"cleaned":$cleanedRows,""" +
      s""""pair_source":"$srcName","strip":$strip,""" +
      s""""tokenize":${tokArg.isDefined},""" +
      (if (tokArg.isDefined)
        s""""merges":${merges.get.size},"bpe_train_s":${f"$tBpe%.2f"},"""
      else "") +
      s""""decisions":$dec,"stage_walls":$stagesJson,""" +
      s""""wall_s":${f"$wall%.2f"},"sf":"$sfDir"}""")
    spark.stop()
  }
}
