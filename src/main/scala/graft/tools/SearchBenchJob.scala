package graft.tools

import org.apache.spark.sql.functions.col

import graft.{Sessions, Tables}
import graft.jobs.AdmissionIndexes
import graft.text.Search

/** Timed BM25 retrieval, all faces of [[graft.text.Search]]:
  * `direct_s` scans documents and builds query-term postings inline
  * (pays text tokenization per query); `probe_s` runs the same query
  * against the PERSISTED term-bucketed postings index
  * (`index_build_s`, one-time — at real scale this table is
  * maintained, not rebuilt) plus a PERSISTED corpus-stats table
  * (the cold-session path: text is never touched). The two must
  * return identical rows — checked here, not just asserted.
  *
  * Then the many-query workload: `nQueries` 3-term queries drawn
  * deterministically from the corpus vocabulary, run (a) as
  * `nQueries` sequential bm25FromPostings jobs (`multi_singles_s` —
  * the driver-cadence wall) and (b) as ONE bm25Batch pass
  * (`multi_batch_s`); `multi_speedup` is (a)/(b), and the batch
  * results are checked row-identical to the sequential ones.
  * Args: <sfDir> [k=20] [nQueries=32]. */
object SearchBenchJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SearchBenchJob <sfDir> [k] [nQueries]")
    val sfDir = args(0)
    val k = if (args.length >= 2) args(1).toInt else 20
    val nQueries = if (args.length >= 3) args(2).toInt else 32
    val terms = Seq("spark", "window", "merge")
    val spark = Sessions.local("graft-searchbench")
    val docs = Tables.documents(spark, sfDir).localCheckpoint()
    val nDocs = docs.count()

    val t0 = System.nanoTime()
    val direct = Search.bm25(docs, "doc_id", "text", terms, k)
      .collect().toList
    val tDirect = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    AdmissionIndexes.savePostingsIndex(
      Search.postings(docs, "doc_id", "text"),
      "postings_bench", buckets = 32)
    AdmissionIndexes.saveCorpusStats(
      Search.corpusStats(docs, "text"), "postings_bench_stats")
    val tBuild = (System.nanoTime() - t1) / 1e9

    val post = AdmissionIndexes.load(spark, "postings_bench")
    val stats = AdmissionIndexes
      .loadCorpusStats(spark, "postings_bench_stats").localCheckpoint()
    val t2 = System.nanoTime()
    val probed = Search.bm25FromPostings(post, stats,
      "doc_id", terms, k).collect().toList
    val tProbe = (System.nanoTime() - t2) / 1e9
    require(probed == direct,
      s"probe path diverged from direct scorer: $probed vs $direct")

    // many-query workload: nQueries 3-term queries over the corpus
    // vocabulary, picked by stride arithmetic (deterministic, no RNG)
    val vocab = post.select(col("term")).distinct()
      .orderBy(col("term")).limit(2048)
      .collect().map(_.getString(0))
    val qs: Seq[(Long, Seq[String])] = (0 until nQueries).map { i =>
      val ts = (0 until 3)
        .map(j => vocab((i * 7 + j * 11) % vocab.length)).distinct
      (i.toLong, ts)
    }
    val t3 = System.nanoTime()
    val singles = qs.map { case (qid, ts) =>
      qid -> Search.bm25FromPostings(post, stats, "doc_id", ts, k)
        .collect().toList
    }.toMap
    val tSingles = (System.nanoTime() - t3) / 1e9

    import spark.implicits._
    val queryTable = qs.flatMap { case (qid, ts) => ts.map((qid, _)) }
      .toDF("query_id", "term")
    val t4 = System.nanoTime()
    val batch = Search.bm25Batch(post, stats, queryTable, "doc_id", k)
      .collect()
    val tBatch = (System.nanoTime() - t4) / 1e9

    // driver-resident query vocabulary as literals: the term filter
    // bucket-prunes the persisted index scan at planning time
    val t5 = System.nanoTime()
    val prunedRows = Search.bm25Batch(post, stats, queryTable,
      "doc_id", k,
      vocabulary = Some(qs.flatMap(_._2).distinct)).collect()
    val tPruned = (System.nanoTime() - t5) / 1e9
    require(prunedRows.toList == batch.toList,
      "vocabulary-pruned batch diverged from the semi-join batch")

    val batchByQ = batch.groupBy(_.getLong(0)).map { case (qid, rows) =>
      qid -> rows.sortBy(_.getInt(4))
        .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toList
    }
    val singlesShaped = singles.map { case (qid, rows) =>
      qid -> rows.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    }
    require(batchByQ == singlesShaped,
      "bm25Batch diverged from the sequential single-query runs")

    println(s"""{"docs":$nDocs,"k":$k,"terms":${terms.size},""" +
      s""""direct_s":${f"$tDirect%.2f"},"index_build_s":${f"$tBuild%.2f"},""" +
      s""""probe_s":${f"$tProbe%.2f"},"n_queries":$nQueries,""" +
      s""""multi_singles_s":${f"$tSingles%.2f"},""" +
      s""""multi_batch_s":${f"$tBatch%.2f"},""" +
      s""""multi_pruned_s":${f"$tPruned%.2f"},""" +
      s""""multi_speedup":${f"${tSingles / tBatch}%.1f"},""" +
      s""""match":true,"sf":"$sfDir"}""")
    spark.stop()
  }
}
