package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding TOKENIZER TRAINING — the classic
  * word-level formulation (Sennrich et al., ACL 2016): the corpus is
  * reduced ONCE to its (word, count) table, and every merge
  * iteration runs on that vocab-sized table, never the corpus. That
  * is the shape that scales: at 100 TB the corpus contributes one
  * explode + one hash aggregate (the same plan as q_term_df), after
  * which training touches ~10-100M distinct words regardless of how
  * many petabytes produced them.
  *
  * Each iteration: count adjacent symbol pairs (weighted by word
  * count), pick the global argmax — a ONE-ROW collect, a planning
  * decision exactly like the IVF fit, not a data path — and rewrite
  * the symbol arrays with the merged pair. The rewrite is a pure
  * column `aggregate` fold (codegen-free HOF but row-local; words
  * are short), and the per-round result is localCheckpoint'ed like
  * Dedup.connectedComponents' label frames — without it the lineage
  * grows one fold per merge and Catalyst analysis goes exponential.
  *
  * Determinism: ties on pair count break lexicographically on
  * (first, second) — pinned in BOTH the trainer and the spec's
  * driver-side reference implementation, so the merge sequence is
  * reproducible across partitionings and runs.
  */
object Bpe {

  /** The trained artifacts: ordered merge list and the final symbol
    * vocabulary with corpus frequencies. */
  final case class Trained(
      merges: Seq[(String, String)],
      vocab: DataFrame) // (symbol, weight)

  /** (word, cnt) corpus reduction — the ONLY full-corpus pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** One left-to-right greedy merge pass of `(a, b) -> a+b` over a
    * symbol array, as a column fold: append each symbol unless it
    * forms the pair with the current last element, in which case the
    * last element is replaced by the concatenation. Greedy-left
    * matches the reference algorithm ("aaa" under (a,a) becomes
    * [aa, a]). */
  private def mergeOnce(symbols: Column, a: String, b: String): Column =
    aggregate(symbols,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Train `numMerges` BPE merges over the corpus. Stops early when
    * the best remaining pair's weighted count falls below
    * `minPairCount` (no useful merges left).
    *
    * `checkpointEvery` bounds lineage: the fold column stacks one
    * expression layer per merge, so every few rounds the word table
    * is localCheckpoint'ed (at real scale: persisted to storage) —
    * identical discipline to connectedComponents' label rounds. */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L,
      checkpointEvery: Int = 4): Trained =
    trainFromWordCounts(wordCounts(docs, textCol), numMerges,
      minPairCount, checkpointEvery)

  /** [[train]] over a PRECOMPUTED (word, cnt) table — the entry point
    * when the caller already paid the one full-corpus reduction (and
    * the one a measurement harness uses so training time never
    * re-includes the corpus scan). */
  def trainFromWordCounts(
      counts: DataFrame,
      numMerges: Int,
      minPairCount: Long = 2L,
      checkpointEvery: Int = 4): Trained = {
    var words = counts
      .select(col("cnt"), split(col("word"), "").as("sym"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var done = false
    while (!done && merges.size < numMerges) {
      // adjacent-pair counts weighted by word frequency: zip the
      // symbol array with its own tail
      val best = words
        .select(col("cnt"),
          explode(zip_with(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("cnt")).as("n"))
        // deterministic argmax: count desc, then lexicographic pair
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getAs[Long]("n") < minPairCount) {
        done = true
      } else {
        val a: String = best.head.getAs[String]("a")
        val b: String = best.head.getAs[String]("b")
        merges += ((a, b))
        words = words.select(col("cnt"), mergeOnce(col("sym"), a, b).as("sym"))
        rounds += 1
        if (rounds % checkpointEvery == 0) words = words.localCheckpoint()
      }
    }
    val vocab = words
      .select(col("cnt"), explode(col("sym")).as("symbol"))
      .groupBy("symbol").agg(sum(col("cnt")).as("weight"))
    Trained(merges.toSeq, vocab)
  }

  /** Apply a trained merge list to text, row-locally: tokenize on
    * whitespace, split each word to characters, replay the merges in
    * training order. Returns an array-of-symbols column. Intended for
    * inspection/eval at modest merge counts — each merge is one fold
    * pass, so cost is O(merges x len) per word; a production encoder
    * exports `merges` to a tokenizer runtime instead. */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val words = split(trim(text), "\\s+")
    val encodedWord = merges.foldLeft((w: Column) => split(w, "")) {
      (enc, m) => (w: Column) => mergeOnce(enc(w), m._1, m._2)
    }
    flatten(transform(words, w => encodedWord(w)))
  }
}
