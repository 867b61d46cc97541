package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.text.Search

/** Measures what MaxScore/WAND pruning buys batch BM25 at corpus
  * scale: `nQueries` 3-term queries (each mixing the corpus's most
  * COMMON term with two mid/rare terms — the workload shape where
  * document-at-a-time bounds matter, since the common term's posting
  * list dominates row volume) run through [[Search.bm25Batch]]
  * (`batch_s`) and [[Search.bm25BatchMaxScore]] (`maxscore_s`,
  * includes the θ and candidate passes). Results are REQUIRED
  * identical. `agg_rows_full` / `agg_rows_pruned` count the
  * (query, doc, term) rows reaching the score aggregate without /
  * with the bound filter — the posting-row reduction itself, not a
  * wall-clock proxy. `bounds_build_s` prices the one-time
  * [[Search.termBounds]] pass (maintained with the index, not per
  * query). Args: <sfDir> [k=10] [nQueries=64]. */
object WandBenchJob {

  /** Deterministic Zipf(s=1) corpus: `nDocs` documents of 40 tokens,
    * term of rank r drawn with p ∝ 1/r over a `vocab`-term vocabulary
    * via the inverse CDF r = vocab^u (u from a per-(doc, pos) hash).
    * The testdata corpus is df-UNIFORM by construction (31 base words
    * per decorrelated copy — min/median/max df 250/3862/3923 at 100x,
    * measured), which is the one text shape where MaxScore cannot
    * prune: with no rare terms, θ never exceeds any suffix-bound sum.
    * Real vocabularies are Zipfian, so the pruning measurement runs
    * on this shape too; the tool itself stays deterministic (hash
    * arithmetic, no RNG). */
  private def zipfDocs(spark: org.apache.spark.sql.SparkSession,
      nDocs: Long, vocab: Int): org.apache.spark.sql.DataFrame =
    spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(39)), j =>
        concat(lit("t"), ceil(pow(lit(vocab.toDouble),
          pmod(xxhash64(col("id"), j), lit(1000000L))
            .cast("double") / lit(1000000.0))).cast("long"))))
        .as("text"))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: WandBenchJob <sfDir|zipf:<nDocs>[:<vocab>]> [k] [nQueries]")
    val sfDir = args(0)
    val k = if (args.length >= 2) args(1).toInt else 10
    val nQueries = if (args.length >= 3) args(2).toInt else 64
    val spark = Sessions.local("graft-wandbench")
    import spark.implicits._
    val docs =
      if (sfDir.startsWith("zipf:")) {
        val parts = sfDir.split(":")
        zipfDocs(spark, parts(1).toLong,
          if (parts.length >= 3) parts(2).toInt else 10000)
      } else Tables.documents(spark, sfDir)
    val post = Search.postings(docs, "doc_id", "text").localCheckpoint()
    val stats = Search.corpusStats(docs, "text").localCheckpoint()

    val t0 = System.nanoTime()
    val bounds = Search.termBounds(post, stats).localCheckpoint()
    val tBounds = (System.nanoTime() - t0) / 1e9

    // query mix: the highest-df term (the stopword-ish flood whose
    // posting list dominates row volume) plus two RARE terms from the
    // df-ascending tail (df >= 2k so each query's θ pass can fill a
    // top-k) — the common+discriminative shape real queries have.
    // On a df-uniform corpus the "rare" picks degrade to mid-df terms
    // and pruning honestly reports ~1x.
    val dfAgg = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val common = dfAgg.orderBy(col("df").desc).limit(1)
      .collect()(0).getString(0)
    val rare = dfAgg.filter(col("df") >= 2L * k)
      .orderBy(col("df").asc, col("term")).limit(4096)
      .collect().map(_.getString(0))
    val v = rare.length
    val qs: Seq[(Long, String)] = (0 until nQueries).flatMap { i =>
      Seq((i.toLong, common),
        (i.toLong, rare((i * 13) % v)),
        (i.toLong, rare((v / 3 + i * 7) % v)))
    }.distinct
    val queryTable = qs.toDF("query_id", "term").localCheckpoint()

    def shaped(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getInt(4))).toSet

    val t1 = System.nanoTime()
    val plain = shaped(Search.bm25Batch(post, stats, queryTable,
      "doc_id", k).collect())
    val tBatch = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val pruned = shaped(Search.bm25BatchMaxScore(post, stats, bounds,
      queryTable, "doc_id", k).collect())
    val tMax = (System.nanoTime() - t2) / 1e9
    require(pruned == plain,
      "MaxScore results diverged from the unpruned batch")

    // the reduction itself: rows reaching the score aggregate
    val (qtermsDf, cand) = Search.maxScorePlan(post, stats, bounds,
      queryTable, k, 1.2, 0.75)
    val allTerms = qs.map(_._2).distinct
    val matched = post.filter(col("term").isin(allTerms: _*))
      .join(broadcast(qtermsDf), Seq("term"))
    val rowsFull = matched.count()
    val rowsPruned = matched
      .join(cand, Seq("query_id", "id"), "left_semi").count()

    println(s"""{"k":$k,"n_queries":$nQueries,""" +
      s""""bounds_build_s":${f"$tBounds%.2f"},""" +
      s""""batch_s":${f"$tBatch%.2f"},""" +
      s""""maxscore_s":${f"$tMax%.2f"},""" +
      s""""agg_rows_full":$rowsFull,"agg_rows_pruned":$rowsPruned,""" +
      s""""row_reduction":${f"${rowsFull.toDouble / math.max(rowsPruned, 1)}%.1f"},""" +
      s""""match":true,"sf":"$sfDir"}""")
    spark.stop()
  }
}
