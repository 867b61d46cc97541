package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernel for training-data pipelines: token counting,
  * quality heuristics, language-ID scoring, and document
  * fingerprinting. Pure Column expression chains — everything stays in
  * WholeStageCodegen and scales embarrassingly (per-row, no shuffle).
  */
object TextStats {

  /** Whitespace tokens (collapsed runs, trimmed ends). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** The fused word-statistics struct (graft.plans.WordStats): one
    * compiled pass yields token count, summed length, distinct count,
    * and stopword hits. The scalar helpers below project fields of
    * it; several of them in one projection still cost ONE pass
    * (codegen subexpression elimination). Null text yields null stats
    * (the interpreted forms' size(null) = -1 non-ANSI artifact is
    * deliberately not reproduced). */
  def wordStats(text: Column): Column = graft.plans.WordStats(text)

  def tokenCount(text: Column): Column =
    wordStats(text).getField("n_tokens")

  /** BPE-ish subword proxy: count letter runs, digits, and isolated
    * punctuation separately — a cheap, deterministic stand-in for a
    * real tokenizer's piece count. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Fraction of tokens that are stopwords. The default list rides
    * the fused native pass; custom lists use the composable form. */
  def stopwordRatio(text: Column, stop: Seq[String] = defaultStopwords): Column =
    if (stop == defaultStopwords) {
      val ws = wordStats(text)
      ws.getField("stop_hits").cast("double") /
        ws.getField("n_tokens").cast("double")
    } else {
      val toks = tokens(text)
      val hits = size(filter(toks, t => t.isin(stop.map(lit(_).cast("string")): _*)))
      hits.cast("double") / size(toks).cast("double")
    }

  /** Fraction of non-space chars that are punctuation/symbols. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") /
      greatest(regexp_count(text, lit("\\S")).cast("double"), lit(1.0))

  /** Mean token length — short-token soup and URL-glue both move it. */
  def meanTokenLen(text: Column): Column = {
    val ws = wordStats(text)
    ws.getField("sum_len").cast("double") /
      ws.getField("n_tokens").cast("double")
  }

  /** Composite quality score in [0,1]: rewards mid-length docs and
    * moderate stopword presence, penalizes symbol soup. Deterministic
    * arithmetic only. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val punctPenalty = least(punctRatio(text) * lit(2.0), lit(1.0))
    (lenScore * lit(0.5) + stopScore * lit(0.3) +
      (lit(1.0) - punctPenalty) * lit(0.2))
  }

  /** Compression-ratio signal (graft.plans.DeflateRatio, codegen'd):
    * deflate bytes / raw bytes. Low = templated/repetitive content —
    * the byte-level complement of the token-level repetition
    * signals above; threshold like `< 0.3` in a filter. */
  def compressionRatio(text: Column): Column =
    graft.plans.DeflateRatio(text)

  /** Document fingerprint: md5 over the sorted distinct token set —
    * order-insensitive content identity (the "fingerprint dedupe" of
    * data-cleaning pipelines). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: language ID at pipeline scale is a
    * scoring pass, not a model. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "un"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "ein", "nicht", "ist", "zu"),
  )

  /** Stopword-hit count for one language's list (a field of the
    * fused native pass). */
  def langHits(text: Column, lang: String): Column = {
    require(langStopwords.contains(lang), s"unknown lang $lang")
    wordStats(text).getField(s"hits_$lang")
  }

  /** Gopher-style repetition signal: fraction of word occurrences
    * that are repeats of an earlier word (0 for all-distinct text).
    * Pure row-local Column math — no shuffle. */
  def dupWordRatio(text: Column): Column = {
    val ws = wordStats(text)
    lit(1.0) - ws.getField("n_distinct").cast("double") /
      ws.getField("n_tokens").cast("double")
  }

  /** Gopher-style repetition signal: the mass of the most frequent
    * word bigram (most-frequent-bigram count / total bigrams). Texts
    * shorter than two words collapse to one gram -> 1.0.
    *
    * Backed by the codegen'd graft.plans.TopBigramFraction expression
    * (one compiled intern+sort+longest-run pass per row). The previous
    * composable form — array_sort(grams) + an aggregate() longest-run
    * scan — was already row-local O(n log n), but Spark evaluates
    * higher-order functions interpreted per element, and that one
    * kernel was 15% of the whole bench suite; the native expression
    * computes the identical value inside WholeStageCodegen. Still zero
    * shuffle. [[topBigramFractionHof]] keeps the composable form as
    * the parity oracle. */
  def topBigramFraction(text: Column): Column =
    graft.plans.TopBigramFraction(text)

  /** The pure-Column composable form of [[topBigramFraction]] —
    * value-identical; retained as the ScalaTest parity oracle for the
    * native expression (and for sessions without GraftExtensions).
    * Caveat for the fallback use: the token array is referenced from
    * inside the gram lambda, so interpreted evaluation re-tokenizes
    * per gram — fine for a parity test, a reason to prefer the native
    * expression in production plans. */
  def topBigramFractionHof(text: Column): Column = {
    val t = tokens(text)
    val grams = when(size(t) < 2, array(concat_ws(" ", t)))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", slice(t, i, lit(2)))))
    val best = aggregate(
      array_sort(grams),
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"),
        lit(0).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    best.cast("double") / size(grams).cast("double")
  }

  /** Gopher-style composite document filter (the rule set of Rae et
    * al.'s Gopher paper, §A1.1, at our corpus's scale): a document
    * passes when its word count, mean word length, symbol ratio,
    * distinct-stopword presence, and repetition signals all sit
    * inside the configured bounds. Pure row-local Column math over
    * the existing signals — one codegen'd projection, no shuffle;
    * every sub-rule is independently SQL-mirrorable so the composite
    * is oracle-checkable. */
  def gopherFilter(
      text: Column,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minDistinctStopwords: Int = 2,
      maxDupWordRatio: Double = 0.3,
      maxTopBigramFrac: Double = 0.18): Column = {
    val n = tokenCount(text)
    val stopHits = size(array_intersect(
      array_distinct(tokens(text)),
      array(defaultStopwords.map(lit(_)): _*)))
    (n >= minWords) && (n <= maxWords) &&
      (meanTokenLen(text) >= minMeanLen) &&
      (meanTokenLen(text) <= maxMeanLen) &&
      (punctRatio(text) <= maxSymbolRatio) &&
      (stopHits >= minDistinctStopwords) &&
      (dupWordRatio(text) <= maxDupWordRatio) &&
      (topBigramFraction(text) <= maxTopBigramFrac)
  }

  /** Predicted language: argmax of per-language hit counts, ties
    * broken by fixed language order; all-zero -> "und". */
  def langId(text: Column): Column = {
    val langs = langStopwords.keys.toSeq.sorted
    val scored = langs.map(l => struct(langHits(text, l).as("hits"), lit(l).as("lang")))
    // array_max on struct compares (hits, lang) lexicographically; for
    // equal hits the lexicographically LARGEST lang wins, so order ties
    // deterministically. All-zero best -> "und".
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
