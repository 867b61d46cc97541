package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.jobs.AdmissionIndexes

class SearchSpec extends SparkSpec {
  import spark.implicits._

  // equal-length docs make the saturation term collapse to clean
  // rationals: len = avgLen -> tnorm = tf*2.2/(tf + 1.2)
  private val docs = Seq(
    (1L, "spark spark merge"),
    (2L, "window merge fast"),
    (3L, "the quick fox")).toDF("doc_id", "text")

  test("postings build the inverted index: one row per (term, doc), " +
      "tf and doc length carried, edge whitespace contributes no term") {
    val post = Search.postings(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2), r.getLong(3))).toSet
    // (term, id, len, tf)
    assert(post.contains(("spark", 1L, 3, 2L)))
    assert(post.contains(("merge", 1L, 3, 1L)))
    assert(post.contains(("merge", 2L, 3, 1L)))
    assert(post.size == 8) // spark, merge x2, window, fast, the, quick, fox

    val edged = Seq((9L, "\t spark merge \n")).toDF("doc_id", "text")
    val p2 = Search.postings(edged, "doc_id", "text").collect()
    assert(p2.map(_.getString(0)).sorted.toList == List("merge", "spark"))
    assert(p2.forall(_.getInt(2) == 2), "edge whitespace must not pad len")
  }

  test("bm25 ranks by saturated tf and rarity, hand-checked score") {
    val res = Search.bm25(docs, "doc_id", "text",
      Seq("window"), k = 10).collect()
    // df=1, N=3: idf = ln(1 + (3-1+0.5)/(1+0.5)) = ln(1 + 5/3)
    // ~= 0.98082925; tf=1, len=avgLen: tnorm = 2.2/2.2 = 1.0 ->
    // score = 0.980829 after DECIMAL(18,6)
    assert(res.map(_.getLong(0)).toList == List(2L))
    assert(math.abs(res(0).getDouble(1) - 0.980829) < 1e-9)

    val multi = Search.bm25(docs, "doc_id", "text",
      Seq("spark", "window", "merge"), k = 10).collect()
    // doc 1 (spark tf=2 rare via df=1, merge) must outrank doc 2
    // (window + merge); doc 3 matches nothing and must be absent.
    // Hand-checked with the Lucene-form log idf: doc1 = round(ln(1 +
    // 5/3) * (2*2.2/3.2)) + round(ln(1.6)) = 1.348640 + 0.470004,
    // doc2 = 0.980829 + 0.470004.
    assert(multi.map(_.getLong(0)).toList == List(1L, 2L))
    assert(multi(0).getLong(2) == 2 && multi(1).getLong(2) == 2)
    assert(math.abs(multi(0).getDouble(1) - 1.818644) < 1e-9)
    assert(math.abs(multi(1).getDouble(1) - 1.450833) < 1e-9)
  }

  test("bm25FromPostings over the persisted bucketed index equals " +
      "the direct scorer bit-for-bit") {
    val direct = Search.bm25(docs, "doc_id", "text",
      Seq("spark", "merge"), k = 10).collect().toList
    AdmissionIndexes.savePostingsIndex(
      Search.postings(docs, "doc_id", "text"),
      "postings_index_bucketed", buckets = 4)
    val stats = Search.corpusStats(docs, "text").localCheckpoint()
    val probed = Search.bm25FromPostings(
      AdmissionIndexes.load(spark, "postings_index_bucketed"), stats,
      "doc_id", Seq("spark", "merge"), k = 10).collect().toList
    assert(probed == direct)
  }

  test("k bounds the result and ties break deterministically by id") {
    val tied = Seq(
      (5L, "alpha beta"), (4L, "alpha beta"), (6L, "alpha beta"))
      .toDF("doc_id", "text")
    val res = Search.bm25(tied, "doc_id", "text", Seq("alpha"), k = 2)
      .collect()
    assert(res.map(_.getLong(0)).toList == List(4L, 5L))
  }
}
