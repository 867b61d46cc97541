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

  test("bm25Batch scores a query TABLE in one pass, bit-identical to " +
      "the equivalent single-query calls, ranked per query") {
    val post = Search.postings(docs, "doc_id", "text").localCheckpoint()
    val stats = Search.corpusStats(docs, "text").localCheckpoint()
    val qs = Map(
      1L -> Seq("spark", "merge"),
      2L -> Seq("window", "fast"),
      3L -> Seq("the", "quick", "fox"))
    val queries = qs.toSeq.flatMap { case (qid, ts) => ts.map((qid, _)) }
      .toDF("query_id", "term")
    val batch = Search.bm25Batch(post, stats, queries, "doc_id", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getInt(4))).toSet
    val singles = qs.toSeq.flatMap { case (qid, ts) =>
      Search.bm25FromPostings(post, stats, "doc_id", ts, k = 2)
        .collect().toSeq.zipWithIndex.map { case (r, i) =>
          (qid, r.getLong(0), r.getDouble(1), r.getLong(2), i + 1) }
    }.toSet
    assert(batch == singles)
  }

  test("bm25Batch collapses duplicate (query_id, term) rows — a term " +
      "listed twice scores once, like the Seq faces") {
    val post = Search.postings(docs, "doc_id", "text").localCheckpoint()
    val stats = Search.corpusStats(docs, "text").localCheckpoint()
    val dup = Seq((1L, "spark"), (1L, "spark"), (1L, "merge"))
      .toDF("query_id", "term")
    val got = Search.bm25Batch(post, stats, dup, "doc_id", k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toList
    val want = Search.bm25FromPostings(post, stats, "doc_id",
        Seq("spark", "merge"), k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toList
    assert(got == want)
  }

  test("cold-session probe: persisted postings + ADDITIVE corpus-stats " +
      "table alone reproduce the direct scorer — text never re-read") {
    // two "batches" admitted over time: index appended, stats row
    // appended per batch; the fold must equal single-shot stats
    val batch1 = docs.filter(col("doc_id") <= 2L)
    val batch2 = docs.filter(col("doc_id") === 3L)
    AdmissionIndexes.savePostingsIndex(
      Search.postings(batch1, "doc_id", "text"), "postings_cold",
      buckets = 4)
    AdmissionIndexes.saveCorpusStats(
      Search.corpusStats(batch1, "text"), "postings_cold_stats")
    AdmissionIndexes.savePostingsIndex(
      Search.postings(batch2, "doc_id", "text"), "postings_cold",
      buckets = 4, append = true)
    AdmissionIndexes.saveCorpusStats(
      Search.corpusStats(batch2, "text"), "postings_cold_stats",
      append = true)
    val statsRows = AdmissionIndexes
      .loadCorpusStats(spark, "postings_cold_stats").collect()
    assert(statsRows.length == 1)
    assert(statsRows(0).getLong(0) == 3L && statsRows(0).getLong(1) == 9L)
    val probed = Search.bm25FromPostings(
      AdmissionIndexes.load(spark, "postings_cold"),
      AdmissionIndexes.loadCorpusStats(spark, "postings_cold_stats"),
      "doc_id", Seq("spark", "merge"), k = 10).collect().toList
    val direct = Search.bm25(docs, "doc_id", "text",
      Seq("spark", "merge"), k = 10).collect().toList
    assert(probed == direct)
  }

  test("bm25Batch with a literal vocabulary PRUNES postings buckets at " +
      "planning time and matches the semi-join path row-for-row") {
    AdmissionIndexes.savePostingsIndex(
      Search.postings(docs, "doc_id", "text"), "postings_pruned",
      buckets = 8)
    val post = AdmissionIndexes.load(spark, "postings_pruned")
    val stats = Search.corpusStats(docs, "text").localCheckpoint()
    val queries = Seq((1L, "spark"), (1L, "merge"), (2L, "window"))
      .toDF("query_id", "term")
    val semi = Search.bm25Batch(post, stats, queries, "doc_id", k = 5)
      .collect().toList
    val pruned = Search.bm25Batch(post, stats, queries, "doc_id", k = 5,
      vocabulary = Some(Seq("spark", "merge", "window")))
    assert(pruned.collect().toList == semi)
    val plan = pruned.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.nonEmpty, s"expected a bucket-pruned scan in:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"expected fewer than all ${m.get.group(2)} buckets read")
  }

  test("bm25Batch refuses a vocabulary that does not cover the query " +
      "terms — a stale vocabulary must fail loudly, not silently drop " +
      "the uncovered terms' postings") {
    val post = Search.postings(docs, "doc_id", "text").localCheckpoint()
    val stats = Search.corpusStats(docs, "text").localCheckpoint()
    val queries = Seq((1L, "spark"), (1L, "window"), (2L, "fox"))
      .toDF("query_id", "term")
    // 'fox' missing from the (stale) vocabulary: executing the plan
    // must raise the named guard, from any action
    val ex = intercept[Exception] {
      Search.bm25Batch(post, stats, queries, "doc_id", k = 5,
        vocabulary = Some(Seq("spark", "window"))).collect()
    }
    def rootChain(t: Throwable): List[String] =
      if (t == null) Nil else t.getMessage :: rootChain(t.getCause)
    val msgs = rootChain(ex).filter(_ != null).mkString(" | ")
    assert(msgs.contains("not covered by the supplied vocabulary") &&
      msgs.contains("fox"),
      s"expected the vocabulary guard naming 'fox', got: $msgs")
    // a covering vocabulary still scores normally
    val ok = Search.bm25Batch(post, stats, queries, "doc_id", k = 5,
      vocabulary = Some(Seq("spark", "window", "fox")))
      .collect()
    assert(ok.nonEmpty)
  }

  test("bm25BatchMaxScore equals bm25Batch row-for-row while its " +
      "bound filter PRUNES documents matching only non-essential " +
      "terms before the score aggregate") {
    // corpus shaped for pruning: a rare term with > k strong matches
    // (so θ is high) and a flood of documents matching ONLY the
    // common term (bounded contribution < θ -> prunable)
    val corpus = (
      (1 to 8).map(i => (i.toLong, "rare common filler" + i)) ++
      (100 to 400).map(i => (i.toLong, s"common pad$i x$i y$i"))
    ).toDF("doc_id", "text")
    val post = Search.postings(corpus, "doc_id", "text").localCheckpoint()
    val stats = Search.corpusStats(corpus, "text").localCheckpoint()
    val bounds = Search.termBounds(post, stats).localCheckpoint()
    val queries = Seq((1L, "rare"), (1L, "common"), (2L, "common"))
      .toDF("query_id", "term")
    val k = 3
    def shaped(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getInt(4))).toSet
    val plain = shaped(Search.bm25Batch(post, stats, queries,
      "doc_id", k))
    val pruned = shaped(Search.bm25BatchMaxScore(post, stats, bounds,
      queries, "doc_id", k))
    assert(pruned == plain && pruned.nonEmpty)
    // the candidate set for query 1 must exclude the common-only
    // flood: every candidate matches the essential 'rare' term
    val (_, cand) = Search.maxScorePlan(post, stats, bounds, queries,
      k, 1.2, 0.75)
    val c1 = cand.filter(col("query_id") === 1L)
      .collect().map(_.getLong(1)).toSet
    assert(c1.nonEmpty && c1.forall(_ <= 8L),
      s"query 1 candidates must be the rare-term docs only, got $c1")
    // query 2 is single-term: everything matching it stays a
    // candidate (no non-essential suffix to cut)
    val c2 = cand.filter(col("query_id") === 2L).count()
    assert(c2 == 8 + 301)
  }

  test("bm25BatchMaxScore equals bm25Batch on the oracle fixture " +
      "(small corpus, θ mostly 0 — the no-pruning degradation path)") {
    val post = Search.postings(docs, "doc_id", "text").localCheckpoint()
    val stats = Search.corpusStats(docs, "text").localCheckpoint()
    val bounds = Search.termBounds(post, stats).localCheckpoint()
    val queries = Seq((1L, "spark"), (1L, "merge"), (2L, "window"),
      (2L, "nosuchterm"), (3L, "the"))
      .toDF("query_id", "term")
    val plain = Search.bm25Batch(post, stats, queries, "doc_id", k = 2)
      .collect().toList
    val pruned = Search.bm25BatchMaxScore(post, stats, bounds, queries,
      "doc_id", k = 2).collect().toList
    assert(pruned == plain)
  }

  test("bm25FromPostingsMaxScore equals bm25FromPostings row-for-row " +
      "on both the pruning-shaped corpus and the tiny fixture (θ=0 " +
      "degradation), duplicate query terms collapse") {
    // pruning-shaped corpus: rare term with > k strong matches, a
    // flood matching only the common term
    val corpus = (
      (1 to 8).map(i => (i.toLong, "rare common filler" + i)) ++
      (100 to 400).map(i => (i.toLong, s"common pad$i x$i y$i"))
    ).toDF("doc_id", "text")
    val post = Search.postings(corpus, "doc_id", "text").localCheckpoint()
    val stats = Search.corpusStats(corpus, "text").localCheckpoint()
    val bounds = Search.termBounds(post, stats).localCheckpoint()
    val terms = Seq("rare", "common")
    val plain = Search.bm25FromPostings(post, stats, "doc_id",
      terms, k = 3).collect().toList
    val pruned = Search.bm25FromPostingsMaxScore(post, stats, bounds,
      "doc_id", terms, k = 3).collect().toList
    assert(pruned == plain && pruned.nonEmpty)
    // duplicate terms score once, matching bm25FromPostings'
    // isin-collapse
    val dup = Search.bm25FromPostingsMaxScore(post, stats, bounds,
      "doc_id", Seq("rare", "rare", "common"), k = 3).collect().toList
    assert(dup == plain)

    // tiny fixture: θ mostly 0, pure degradation to the plain scorer
    val post2 = Search.postings(docs, "doc_id", "text").localCheckpoint()
    val stats2 = Search.corpusStats(docs, "text").localCheckpoint()
    val bounds2 = Search.termBounds(post2, stats2).localCheckpoint()
    val t2 = Seq("spark", "window", "merge")
    assert(Search.bm25FromPostingsMaxScore(post2, stats2, bounds2,
        "doc_id", t2, k = 10).collect().toList ==
      Search.bm25FromPostings(post2, stats2, "doc_id", t2, k = 10)
        .collect().toList)

    // the stale-stamp refusal guards this face too (shared machinery):
    // grow the corpus, keep the old bounds
    val grown = docs.union(Seq((99L, "spark spark spark"))
      .toDF("doc_id", "text"))
    val post3 = Search.postings(grown, "doc_id", "text").localCheckpoint()
    val stats3 = Search.corpusStats(grown, "text").localCheckpoint()
    val e = intercept[IllegalArgumentException] {
      Search.bm25FromPostingsMaxScore(post3, stats3, bounds2,
        "doc_id", t2, k = 2).collect()
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
  }

  test("bm25BatchMaxScore refuses STALE bounds: a postings append " +
      "moves the stats stamp and the scorer must not mis-prune") {
    val post = Search.postings(docs, "doc_id", "text").localCheckpoint()
    val stats = Search.corpusStats(docs, "text").localCheckpoint()
    val bounds = Search.termBounds(post, stats).localCheckpoint()
    // the corpus grows by one document; bounds are now stale
    val grown = docs.union(Seq((99L, "spark spark spark"))
      .toDF("doc_id", "text"))
    val post2 = Search.postings(grown, "doc_id", "text").localCheckpoint()
    val stats2 = Search.corpusStats(grown, "text").localCheckpoint()
    val queries = Seq((1L, "spark")).toDF("query_id", "term")
    val e = intercept[IllegalArgumentException] {
      Search.bm25BatchMaxScore(post2, stats2, bounds, queries,
        "doc_id", k = 2).collect()
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // mismatched scoring constants refuse too
    val e2 = intercept[IllegalArgumentException] {
      Search.bm25BatchMaxScore(post, stats, bounds, queries,
        "doc_id", k = 2, k1 = 0.9).collect()
    }
    assert(e2.getMessage.contains("k1"), e2.getMessage)
  }

  test("k bounds the result and ties break deterministically by id") {
    val tied = Seq(
      (5L, "alpha beta"), (4L, "alpha beta"), (6L, "alpha beta"))
      .toDF("doc_id", "text")
    val res = Search.bm25(tied, "doc_id", "text", Seq("alpha"), k = 2)
      .collect()
    assert(res.map(_.getLong(0)).toList == List(4L, 5L))
  }

  test("stale bounds refuse LOUDLY even when every queried term " +
      "entered the index AFTER the bounds build — a query-filtered " +
      "stamp check would silently return empty instead") {
    val post0 = Search.postings(docs, "doc_id", "text").localCheckpoint()
    val stats0 = Search.corpusStats(docs, "text").localCheckpoint()
    val bounds = Search.termBounds(post0, stats0).localCheckpoint()
    // the index grows: a new doc with a brand-new term
    val grown = docs.union(Seq((4L, "zzznew zzznew")).toDF("doc_id", "text"))
    val post1 = Search.postings(grown, "doc_id", "text").localCheckpoint()
    val stats1 = Search.corpusStats(grown, "text").localCheckpoint()
    // the un-pruned face finds the new doc; the pruned face must
    // REFUSE on the stale stamp, not silently return zero rows
    assert(Search.bm25FromPostings(post1, stats1, "doc_id",
      Seq("zzznew"), k = 2).count() == 1)
    val e = intercept[IllegalArgumentException] {
      Search.bm25FromPostingsMaxScore(post1, stats1, bounds, "doc_id",
        Seq("zzznew"), k = 2).collect()
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
  }

  test("corpusStats: a NULL-text doc contributes length 0 (not the " +
      "legacy size(NULL) = -1) and still counts in n_docs, matching " +
      "an empty-string doc") {
    val mixed = Seq((1L, Some("a b c")), (2L, None), (3L, Some("")))
      .toDF("doc_id", "text")
    val r = Search.corpusStats(mixed, "text").collect().head
    assert(r.getLong(0) == 3, s"n_docs: ${r.getLong(0)}")
    assert(r.getLong(1) == 3,
      s"sum_len must be 3 (null and empty docs add 0): ${r.getLong(1)}")
  }
}
