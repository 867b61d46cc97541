package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering — the SCALE
  * path for "all pairs with Jaccard >= t" that the bounded all-pairs
  * oracle queries (q_jaccard_pairs, doc_id < 60) deliberately avoid.
  *
  * Algorithm (public literature: Bayardo/Ma/Srikant "Scaling Up All
  * Pairs Similarity Search", WWW'07; Xiao et al. "Efficient Similarity
  * Joins for Near Duplicate Detection", WWW'08): under ANY global
  * token order, two sets with overlap >= a must share a token within
  * their first (|x| - a + 1) tokens. For Jaccard >= t the admissible
  * partners of x have size >= ceil(t*|x|), which bounds the required
  * overlap below by ceil(t*|x|), so a prefix of
  * p(x) = |x| - ceil(t*|x|) + 1 tokens per set suffices: every
  * qualifying pair shares at least one PREFIX token. Candidate
  * generation is then a plain equi-join on prefix tokens — never an
  * all-pairs product — followed by an exact Jaccard verify on the
  * candidates only. The output is provably IDENTICAL to brute force
  * (prefix filtering admits false positives, never false negatives,
  * and the verify step removes the former), which is what lets the
  * full-table DuckDB oracle check it exactly.
  *
  * Ordering tokens by ascending document frequency (rare-first, ties
  * by token) is the algorithm's skew defense: a prefix token shared by
  * many documents would create a hot join bucket, but frequent tokens
  * sort LAST and so almost never land in the short prefixes — the
  * candidate join's key distribution is dominated by rare tokens by
  * construction. This replaces the maxBucket caps the approximate
  * paths (minhash/simhash) need: exactness is preserved with no cap.
  *
  * Shuffle audit at scale: one explode+aggregate for document
  * frequencies (shuffles tokens), one token-keyed join + one id
  * aggregate to order each document's tokens, one equi-join on prefix
  * tokens + pair distinct for candidates, two id-keyed joins for the
  * verify. All equi-joins and hash aggregates on uniform or
  * rare-by-construction keys; nothing quadratic appears in the plan.
  */
object SimJoin {

  /** All (id_a < id_b, jacc) pairs of documents whose distinct word
    * `shingleN`-gram sets have Jaccard >= `threshold`. Exact — equals
    * the brute-force all-pairs result. `threshold` must be in (0, 1].
    */
  def prefixJaccardJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    // Distinct shingle set per document; the token array materializes
    // in its own projection before the shingle lambda references it
    // (same re-evaluation discipline as Dedup.shingled).
    val docs = df
      .select(col(idCol).as("id"), split(trim(col(textCol)), "\\s+").as("__t"))
      .select(col("id"), array_distinct(Dedup.shingles(col("__t"), shingleN)).as("sh"))

    val toks = docs.select(col("id"), explode(col("sh")).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("tdf"))

    // Rare-first global order: sort each document's tokens by
    // (document frequency, token). array_sort on the struct gives the
    // deterministic total order every prefix derivation shares.
    val ordered = toks.join(dfreq, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("tdf"), col("tok")))).as("ord"))
      .select(col("id"),
        transform(col("ord"), s => s.getField("tok")).as("toks"),
        size(col("ord")).as("sz"))

    // Prefix length p = sz - ceil(t*sz) + 1. The 1e-9 guard keeps a
    // float-UP rounding of t*sz from SHORTENING the prefix (which
    // could lose pairs); a float-down error only lengthens it, which
    // costs candidates but never correctness.
    val p = greatest(
      (col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)).cast("int")
        + lit(1)),
      lit(1))
    val prefixes = ordered
      .select(col("id"), col("sz"), explode(slice(col("toks"), lit(1), p)).as("tok"))

    // Candidates: share a prefix token, id-ordered, and pass the
    // length filter t*max(|x|,|y|) <= min(|x|,|y|) (necessary for
    // Jaccard >= t, so discarding here is safe).
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
            lit(threshold) * greatest(col("a.sz"), col("b.sz")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    // Exact verify on candidates only: re-join the shingle sets by id
    // and keep pairs at or above the threshold.
    cand
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jacc", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jacc") >= threshold)
      .select(col("id_a"), col("id_b"), col("jacc"))
  }
}
