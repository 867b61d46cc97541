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
    * expression layer per merge, so every few applied merges the word
    * table is localCheckpoint'ed (at real scale: persisted to
    * storage) — identical discipline to connectedComponents' label
    * rounds.
    *
    * `batch` is the per-round merge budget (the standard batched-BPE
    * trick): each distributed pair-count aggregate yields up to
    * `batch` SYMBOL-DISJOINT merges instead of one, accepted in rank
    * order — a candidate joins the batch only if neither of its
    * symbols appears in an already-accepted pair (or its merged
    * symbol). Disjointness makes the batch exact, not approximate:
    * applying merge (a,b) can only change the count of a pair (c,d)
    * that shares a symbol with it (c=b, d=a, or (c,d)=(a,b) — greedy-
    * left consumes the shared occurrence), so every accepted pair's
    * start-of-round count is still its true count when it applies,
    * and the applications commute. `batch=1` IS the sequential
    * algorithm. What batching changes is CADENCE, not data cost: a
    * 32k-merge vocab at batch=8 is ~4k Spark jobs instead of 32k —
    * driver/scheduler round-trips were the binding constraint, the
    * per-round aggregate already touched the whole word table either
    * way. What it can change semantically: a merge involving a
    * symbol CREATED this round (e.g. "ab"+"c") waits for the next
    * round's counts, so the merge ORDER can differ from sequential
    * when a fresh symbol's pair would out-rank remaining candidates
    * (the spec pins both regimes). */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L,
      checkpointEvery: Int = 4,
      batch: Int = 1): Trained =
    trainFromWordCounts(wordCounts(docs, textCol), numMerges,
      minPairCount, checkpointEvery, batch)

  /** [[train]] over a PRECOMPUTED (word, cnt) table — the entry point
    * when the caller already paid the one full-corpus reduction (and
    * the one a measurement harness uses so training time never
    * re-includes the corpus scan). */
  def trainFromWordCounts(
      counts: DataFrame,
      numMerges: Int,
      minPairCount: Long = 2L,
      checkpointEvery: Int = 4,
      batch: Int = 1): Trained = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    var words = graft.Checkpoints.iter(counts
      .select(col("cnt"), split(col("word"), "").as("sym")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var foldsSinceCheckpoint = 0
    var done = false
    while (!done && merges.size < numMerges) {
      val want = math.min(batch, numMerges - merges.size)
      // adjacent-pair counts weighted by word frequency: zip the
      // symbol array with its own tail. Collect a few times the batch
      // budget so the disjointness filter usually fills it; a short
      // round just means the next aggregate runs sooner.
      val top = words
        .select(col("cnt"),
          explode(zip_with(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("cnt")).as("n"))
        .filter(col("n") >= minPairCount)
        // deterministic argmax: count desc, then lexicographic pair —
        // UTF-8 BINARY order (Spark's string comparison), which the
        // spec's reference comparator mirrors byte-for-byte
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(math.max(want * 4, 8)).collect()
      if (top.isEmpty) {
        done = true
      } else {
        // greedy symbol-disjoint selection in rank order; the top
        // candidate always qualifies, so every round makes progress
        val touched = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val it = top.iterator
        while (accepted.size < want && it.hasNext) {
          val r = it.next()
          val a = r.getAs[String]("a")
          val b = r.getAs[String]("b")
          if (!touched(a) && !touched(b)) {
            accepted += ((a, b))
            touched ++= Seq(a, b, a + b)
          }
        }
        merges ++= accepted
        // all of the round's merges apply in ONE pass (nested folds
        // inside a single projection — one job, `accepted.size`
        // expression layers)
        val folded = accepted.foldLeft(col("sym")) {
          case (c, (a, b)) => mergeOnce(c, a, b)
        }
        words = words.select(col("cnt"), folded.as("sym"))
        foldsSinceCheckpoint += accepted.size
        if (foldsSinceCheckpoint >= checkpointEvery) {
          // reliable when the context has a checkpoint dir (a lost
          // executor re-reads instead of killing the training run),
          // local otherwise
          words = graft.Checkpoints.iter(words)
          foldsSinceCheckpoint = 0
        }
      }
    }
    val vocab = words
      .select(col("cnt"), explode(col("sym")).as("symbol"))
      .groupBy("symbol").agg(sum(col("cnt")).as("weight"))
    Trained(merges.toSeq, vocab)
  }

  /** Write the trained artifacts in the standard tokenizer-consumable
    * layout: `<dir>/merges.txt` — a `#version` header then one
    * space-separated pair per line in rank order (the GPT-2/HF
    * convention; BPE symbols come from whitespace tokenization so
    * they can never contain spaces, enforced here) — and
    * `<dir>/vocab.tsv/` (symbol, weight) through the engine's TSV
    * sink, sorted weight-desc for stable files. merges.txt is a
    * driver-local artifact by nature (the ranked list IS the
    * trainer's driver-side output, a few hundred KB at 32k merges);
    * the vocab table is written by Spark. */
  def save(trained: Trained, dir: String): Unit = {
    trained.merges.foreach { case (a, b) =>
      require(!(a + b).exists(_.isWhitespace),
        s"BPE symbols cannot contain whitespace: ($a, $b)")
    }
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    val lines = "#version: 0.2" +: trained.merges.map { case (a, b) => s"$a $b" }
    java.nio.file.Files.write(p.resolve("merges.txt"),
      lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    graft.io.Tsv.write(
      trained.vocab.orderBy(col("weight").desc, col("symbol")),
      p.resolve("vocab.tsv").toString, singleFile = true)
  }

  /** Re-read a saved merge list, rank order preserved — the
    * round-trip counterpart of [[save]], consumable by [[encode]].
    * Only the `#version` HEADER line is skipped (the GPT-2/HF
    * convention): a merge pair whose first symbol itself starts with
    * '#' (corpus words like '#include', hashtags) is real data, and a
    * prefix filter would silently shorten the reloaded list. */
  def loadMerges(dir: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val all = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(dir).resolve("merges.txt"),
        java.nio.charset.StandardCharsets.UTF_8)
      .asScala.toSeq
    val body =
      if (all.headOption.exists(_.startsWith("#version"))) all.tail else all
    body
      .filterNot(_.isEmpty)
      .map { l =>
        val i = l.indexOf(' ')
        require(i > 0 && l.indexOf(' ', i + 1) < 0,
          s"malformed merges.txt line: '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }
  }

  /** Schema of the saved vocab TSV, for [[graft.io.Tsv.read]]. */
  val vocabSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("symbol",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("weight",
        org.apache.spark.sql.types.LongType)))

  /** PRODUCTION encode: the trained merges compile once into a rank
    * table inside the codegen'd [[graft.plans.BpeEncode]] expression
    * (min-rank merge loop — equivalent to training-order replay for
    * trainer-produced lists, pinned by BpeSpec) and each word
    * tokenizes row-locally in O(applied merges x len), with NO
    * per-merge plan layers — this is the encode to put in a pipeline
    * stage at any vocabulary size. */
  def encodeFast(text: Column, merges: Seq[(String, String)]): Column = {
    merges.foreach { case (a, b) =>
      require(!(a + b).exists(_.isWhitespace),
        s"BPE symbols cannot contain whitespace: ($a, $b)")
    }
    call_function("bpe_encode", text,
      lit(merges.map { case (a, b) => s"$a $b" }.toArray))
  }

  /** Apply a trained merge list to text, row-locally: tokenize on
    * whitespace, split each word to characters, replay the merges in
    * training order. Returns an array-of-symbols column. Intended for
    * inspection/eval at modest merge counts — each merge is one fold
    * pass stacked into the PLAN, so cost is O(merges x len) expression
    * layers per word; [[encodeFast]] is the production path (same
    * result, one codegen'd expression). */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val words = split(trim(text), "\\s+")
    val encodedWord = merges.foldLeft((w: Column) => split(w, "")) {
      (enc, m) => (w: Column) => mergeOnce(enc(w), m._1, m._2)
    }
    flatten(transform(words, w => encodedWord(w)))
  }
}
