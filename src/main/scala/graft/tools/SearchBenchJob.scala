package graft.tools

import org.apache.spark.sql.functions.col

import graft.{Sessions, Tables}
import graft.jobs.AdmissionIndexes
import graft.text.Search

/** Timed BM25 retrieval, both faces of [[graft.text.Search]]:
  * `direct_s` scans documents and builds query-term postings inline
  * (pays text tokenization per query); `probe_s` runs the same query
  * against the PERSISTED term-bucketed postings index
  * (`index_build_s`, one-time — at real scale this table is
  * maintained, not rebuilt) plus a stored 1-row corpus-stats frame,
  * never touching text. The two must return identical rows — checked
  * here, not just asserted. Args: <sfDir> [k=20]. */
object SearchBenchJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SearchBenchJob <sfDir> [k]")
    val sfDir = args(0)
    val k = if (args.length >= 2) args(1).toInt else 20
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
    val stats = Search.corpusStats(docs, "text").localCheckpoint()
    val tBuild = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val probed = Search.bm25FromPostings(
      AdmissionIndexes.load(spark, "postings_bench"), stats,
      "doc_id", terms, k).collect().toList
    val tProbe = (System.nanoTime() - t2) / 1e9

    require(probed == direct,
      s"probe path diverged from direct scorer: $probed vs $direct")
    println(s"""{"docs":$nDocs,"k":$k,"terms":${terms.size},""" +
      s""""direct_s":${f"$tDirect%.2f"},"index_build_s":${f"$tBuild%.2f"},""" +
      s""""probe_s":${f"$tProbe%.2f"},"match":true,"sf":"$sfDir"}""")
    spark.stop()
  }
}
