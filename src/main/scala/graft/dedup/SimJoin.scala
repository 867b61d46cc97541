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
  * all-pairs product — followed by an exact verify on the candidates
  * only. The output is provably IDENTICAL to brute force (prefix
  * filtering admits false positives, never false negatives, and the
  * verify step removes the former), which is what lets the full-table
  * DuckDB oracle check it exactly.
  *
  * Three further scale measures, all exactness-preserving:
  *
  *  - POSITIONAL filter (PPJoin): a prefix-token match at ranks
  *    (i, j) of the two ordered token lists bounds the overlap above
  *    by 1 + min(|x|-i, |y|-j) — tokens before the first shared one
  *    are shared by neither. Jaccard >= t needs overlap >=
  *    t/(1+t)*(|x|+|y|), so matches whose bound falls short are
  *    dropped BEFORE the pair aggregate; for a qualifying pair its
  *    first shared prefix token always passes, so no pair is lost.
  *    (Measured at sf0.1: 310k -> 125k candidates.)
  *  - OVERLAP ACCUMULATION (PPJoin Alg. 1's A[c] counter, done as an
  *    aggregate): the pair-distinct becomes a groupBy — same shuffle
  *    — that counts the shared prefix tokens `alpha` and keeps the
  *    LAST match's ranks (la, lb). Because both token lists follow
  *    the same global order, shared tokens interleave monotonically
  *    in both, so every shared token up to the last prefix match is
  *    itself a prefix match: overlap = alpha + |shared after
  *    (la, lb)| <= alpha + min(|x|-la, |y|-lb). That bound is
  *    provably no looser than any single match's positional bound
  *    (alpha <= 1 + la - first_la, ditto b), so it prunes strictly
  *    more candidates at zero extra cost.
  *  - SUFFIX verify (the role PPJoin+'s suffix filter plays, taken
  *    to its exact conclusion): the same monotonicity means the
  *    UNCOUNTED shared tokens all sit strictly after rank la in x
  *    AND after lb in y, so overlap = alpha +
  *    |suffix_x(la) n suffix_y(lb)| EXACTLY. Joining each side's
  *    ordered token array once per candidate and intersecting the
  *    two SLICED suffixes row-locally replaces the old verify
  *    fan-out (one row per candidate x every token of x, the suite's
  *    largest shuffle) with one array row per candidate side — and
  *    the filter and the exact answer become the same computation.
  *    (Measured at sf0.1, with the InferFiltersFromGenerate session
  *    exclusion — see Sessions: q_simjoin_prefix 6.2 s -> ~3.4 s.)
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
  * tokens + pair distinct for candidates, two token/id-keyed joins +
  * one pair aggregate for the verify. All equi-joins and hash
  * aggregates on uniform or rare-by-construction keys; nothing
  * quadratic appears in the plan.
  */
object SimJoin {

  /** All (id_a < id_b, jacc) pairs of documents whose distinct word
    * `shingleN`-gram sets have Jaccard >= `threshold`. Exact — equals
    * the brute-force all-pairs result under EVERY flag combination
    * (the flags trade pruning strength and verify shape, never
    * completeness; SimJoinSpec pins parity for all four).
    * `threshold` must be in (0, 1].
    *
    * `positional`: apply the per-match positional filter and the
    * accumulated alpha + min-remaining bound before verification.
    * `suffixVerify`: verify via the row-local suffix-array
    * intersection (default); false falls back to the relational
    * token-join verify — kept because its shuffles carry only narrow
    * (id, token) tuples, the shape to prefer if document token lists
    * ever outgrow comfortable row size. */
  def prefixJaccardJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double,
      positional: Boolean = true,
      suffixVerify: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val toks = tokenStream(df, idCol, textCol, shingleN)
    // The ordered view feeds the prefix self-join (twice) and the
    // suffix verify (twice more): checkpoint it, same rationale as
    // the token stream's.
    val ordered = orderedOf(toks).localCheckpoint(false)
    val prefixes = prefixesOf(ordered, threshold)

    // Candidate matches: share a prefix token, id-ordered, length
    // filter t*max(|x|,|y|) <= min(|x|,|y|), and (when `positional`)
    // the per-match positional bound — all necessary conditions for
    // Jaccard >= t, so discarding is safe; every 1e-9 slack keeps
    // float rounding one-sided (toward keeping candidates).
    val lengthOk =
      least(col("a.sz"), col("b.sz")).cast("double") >=
        lit(threshold) * greatest(col("a.sz"), col("b.sz")) - lit(1e-9)
    val requiredOverlap = (szA: Column, szB: Column) =>
      lit(threshold / (1.0 + threshold)) * (szA + szB).cast("double") -
        lit(1e-9)
    val matchOk =
      if (positional)
        lengthOk &&
          (lit(1) + least(col("a.sz") - col("a.rn"),
                          col("b.sz") - col("b.rn"))).cast("double") >=
            requiredOverlap(col("a.sz"), col("b.sz"))
      else lengthOk
    val matches = prefixes.as("a").join(prefixes.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") && matchOk)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"),
        col("a.rn").as("rn_a"), col("b.rn").as("rn_b"))

    // Accumulation (one groupBy where the distinct used to be):
    // alpha = shared prefix tokens; (la, lb) = the LAST match's
    // ranks. max(rn_a) and max(rn_b) are the same match's ranks —
    // shared tokens interleave monotonically in both ordered lists.
    val cand0 = matches
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("alpha"),
        max(col("rn_a")).as("la"), max(col("rn_b")).as("lb"))
    val cand =
      if (positional)
        cand0.filter(
          (col("alpha") + least(col("sz_a") - col("la"),
            col("sz_b") - col("lb"))).cast("double") >=
            requiredOverlap(col("sz_a"), col("sz_b")))
      else cand0

    if (suffixVerify) suffixVerifyPairs(cand, ordered, threshold)
    else verifyPairs(
      cand.select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b")),
      toks, threshold)
  }

  /** (tok, prefix_df) of prefix tokens whose document frequency WITHIN
    * THE PREFIXES exceeds `maxPrefixDf` — the monitoring companion to
    * [[prefixJaccardJoin]]'s rare-first ordering (mirrors
    * Dedup.oversizedMinhashBuckets). The join itself never caps (a cap
    * would break exactness); this reports where adversarial data —
    * e.g. thousands of near-identical boilerplate documents whose rare
    * tokens are SHARED — would concentrate candidate mass, so the
    * operator's cost is observable before it is paid. Each reported
    * token contributes ~prefix_df^2/2 candidate pairs; rows here
    * usually mean exact-dedupe should run first. */
  def hotPrefixTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double,
      maxPrefixDf: Long = 10000L): DataFrame =
    prefixesOf(orderedOf(tokenStream(df, idCol, textCol, shingleN)), threshold)
      .groupBy(col("tok")).agg(count(lit(1)).as("prefix_df"))
      .filter(col("prefix_df") > maxPrefixDf)

  /** Distinct (id, token) stream of word `shingleN`-gram shingles.
    * The token array materializes in its own projection before the
    * shingle lambda references it (same re-evaluation discipline as
    * Dedup.shingled). The stream feeds several consumers (document
    * frequencies, the ordered assembly, both verify joins); without a
    * checkpoint each consumer re-runs the scan+shingle+explode
    * lineage. A lazy localCheckpoint materializes it once on first
    * use — the cluster-scale equivalent is staging the token table to
    * storage once, the same explicit materialize-vs-recompute call. */
  private def tokenStream(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    // COMPOSED from Dedup.shingled, not re-implemented: the pipeline
    // compares/combines this exact join with the LSH path, and two
    // private copies of "what is a shingle" could silently drift —
    // one definition keeps the cross-path parity structural
    Dedup.shingled(df, idCol, textCol, shingleN)
      .select(col("id"), explode(col("sh")).as("tok"))
      .localCheckpoint(false)

  /** (id, toks, sz): each document's tokens as ONE array sorted by
    * the rare-first global order — (document frequency, token);
    * array_sort on the struct gives the deterministic total order
    * every prefix and suffix derivation shares. */
  private def orderedOf(toks: DataFrame): DataFrame = {
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("tdf"))
    toks.join(dfreq, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("tdf"), col("tok")))).as("ord"))
      .select(col("id"),
        transform(col("ord"), s => s.getField("tok")).as("toks"),
        size(col("ord")).as("sz"))
  }

  /** (id, sz, rank, token) for each document's PREFIX tokens: the
    * ordered array cut to prefix length p = sz - ceil(t*sz) + 1. The
    * 1e-9 guard keeps a float-UP rounding of t*sz from SHORTENING the
    * prefix (which could lose pairs); a float-down error only
    * lengthens it, which costs candidates but never correctness. The
    * 1-based rank feeds the positional filter. */
  private def prefixesOf(ordered: DataFrame, threshold: Double): DataFrame = {
    val p = greatest(
      (col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)).cast("int")
        + lit(1)),
      lit(1))
    ordered
      .select(col("id"), col("sz"),
        posexplode(slice(col("toks"), lit(1), p)).as(Seq("pos0", "tok")))
      .select(col("id"), col("sz"), (col("pos0") + 1).as("rn"), col("tok"))
  }

  /** Exact verify without the token fan-out: overlap = alpha (shared
    * prefix tokens, already counted) + the intersection of the two
    * ordered SUFFIXES after the last matched ranks (la, lb) — every
    * shared token at or before the last prefix match IS a prefix
    * match (monotone interleaving), so nothing is double-counted and
    * nothing is missed. One ordered-array join per side, one
    * row-local array_intersect per candidate; jacc divides the same
    * integers the SQL oracle divides, so the doubles are
    * bit-identical. */
  private def suffixVerifyPairs(
      cand: DataFrame, ordered: DataFrame, threshold: Double): DataFrame = {
    val withInter = cand
      .join(ordered.select(col("id").as("id_a"), col("toks").as("__ta")),
        "id_a")
      .join(ordered.select(col("id").as("id_b"), col("toks").as("__tb")),
        "id_b")
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
        (col("alpha") + size(array_intersect(
          slice(col("__ta"), col("la") + lit(1), col("sz_a") - col("la")),
          slice(col("__tb"), col("lb") + lit(1), col("sz_b") - col("lb")))))
          .as("inter"))
      // Materialization barrier (narrow int rows, one per candidate):
      // without it, pushdown substitutes the jacc filter into the
      // join CONDITION, where `inter`'s defining array intersection
      // appears twice, and the output projection evaluates it a third
      // time. Behind the barrier the intersection runs exactly once
      // per candidate and the arrays never outlive the join task.
      .localCheckpoint(false)
    // jacc divides the same integers the SQL oracle's relational form
    // divides, so the doubles are bit-identical.
    withInter
      .withColumn("jacc", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jacc") >= threshold)
      .select(col("id_a"), col("id_b"), col("jacc"))
  }

  private def verifyPairs(
      cand: DataFrame, toks: DataFrame, threshold: Double): DataFrame = {
    // Exact verify, relationally: intersection size = count of shared
    // tokens via two equi-joins over the candidates' (id, token)
    // rows. jacc = inter/(sz_a+sz_b-inter) divides the same integers
    // the SQL oracle's relational form divides, so the doubles are
    // bit-identical. An inner count join is safe: every candidate
    // shares its generating prefix token, so inter >= 1.
    cand
      .join(toks.select(col("id").as("id_a"), col("tok")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("tok")), Seq("id_b", "tok"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jacc", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jacc") >= threshold)
      .select(col("id_a"), col("id_b"), col("jacc"))
  }
}
