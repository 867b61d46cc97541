package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.jobs.AdmissionIndexes
import graft.text.Search

/** Prices crash-safe index compaction at corpus scale: builds the
  * term-bucketed postings index of <sfDir>'s documents table, appends
  * `nDeltas` small per-batch deltas (the admission loop's write
  * pattern — one file per (append x bucket)), then runs the
  * write-then-swap [[AdmissionIndexes.compact]] and reports walls,
  * file counts, and a before/after probe-equality check (the same
  * q_bm25_topk terms, results REQUIRED identical).
  *
  * The number that matters: `compact_s` vs `index_build_s` — the
  * swap-based rewrite reads the fragmented table and writes one file
  * per bucket WITHOUT dropping the live copy, so its cost is one
  * extra full-table write over the in-place form it replaced, bought
  * for the no-data-loss crash contract. Args: <sfDir> [buckets=64]
  * [nDeltas=5]. */
object CompactBenchJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CompactBenchJob <sfDir> [buckets] [nDeltas]")
    val sfDir = args(0)
    val buckets = if (args.length >= 2) args(1).toInt else 64
    val nDeltas = if (args.length >= 3) args(2).toInt else 5
    val spark = Sessions.local("graft-compactbench")
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()

    val t0 = System.nanoTime()
    AdmissionIndexes.savePostingsIndex(
      Search.postings(docs, "doc_id", "text"), "compact_bench",
      buckets = buckets)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val rows0 = spark.table("compact_bench").count()

    val t1 = System.nanoTime()
    (1 to nDeltas).foreach { e =>
      val delta = docs.filter(col("doc_id") % 1000 === e)
        .select((col("doc_id") + e * 100000000L).as("doc_id"), col("text"))
      AdmissionIndexes.savePostingsIndex(
        Search.postings(delta, "doc_id", "text"), "compact_bench",
        buckets = buckets, append = true)
    }
    val tAppend = (System.nanoTime() - t1) / 1e9

    def files(): Int = {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      new java.io.File(wh, "compact_bench").listFiles()
        .count(_.getName.startsWith("part-"))
    }
    val filesBefore = files()
    val terms = Seq("spark", "window", "merge")
    val stats = Search.corpusStats(docs, "text").localCheckpoint()
    def probe() = Search.bm25FromPostings(
      spark.table("compact_bench"), stats, "doc_id", terms, 20)
      .collect().toList
    val before = probe()

    val t2 = System.nanoTime()
    AdmissionIndexes.compact(spark, "compact_bench",
      AdmissionIndexes.postingsKeys, buckets = buckets)
    val tCompact = (System.nanoTime() - t2) / 1e9
    val filesAfter = files()
    val rows1 = spark.table("compact_bench").count()
    require(rows1 >= rows0, "compaction lost rows")
    require(probe() == before,
      "probe diverged across compaction — the swap broke the index")

    println(s"""{"docs":$nDocs,"buckets":$buckets,"n_deltas":$nDeltas,""" +
      s""""index_rows":$rows1,"index_build_s":${f"$tBuild%.2f"},""" +
      s""""append_total_s":${f"$tAppend%.2f"},""" +
      s""""compact_s":${f"$tCompact%.2f"},""" +
      s""""files_before":$filesBefore,"files_after":$filesAfter,""" +
      s""""probe_match":true,"sf":"$sfDir"}""")
    spark.sql("DROP TABLE IF EXISTS compact_bench")
    spark.stop()
  }
}
