package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — correct for any data, used as
  * the oracle. Scale path: random-hyperplane LSH bucketing so the
  * candidate join is equi on (table, bucket) instead of a cross join;
  * recall is tuned with more tables, not wider scans. At 100 TB the
  * brute-force path is only ever used with a broadcast-small query
  * side (BroadcastNestedLoopJoin, no shuffle of the base table).
  */
object Similarity {

  /** Dot product of two numeric arrays, computed in double with a
    * fixed left-to-right fold — bit-deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Composable higher-order-function cosine (any numeric arrays). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native fused-loop cosine for float vectors (graft.plans
    * .CosineSimilarity, codegen'd) — bit-identical to cosineHof on
    * float input, one pass, no intermediate array. The hot scoring
    * path uses this.
    *
    * NaN-SAFE: a zero-norm vector has no direction, so its cosine
    * against anything is 0/0 = NaN — and Spark's NaN ordering treats
    * NaN as GREATER than every double, so a raw NaN score would (a)
    * pass every `>= threshold` filter (semanticDedup would merge a
    * zero vector's whole cell into one component — silent data
    * loss) and (b) out-rank every true neighbor in the top-k
    * windows, INCLUDING the bruteForceTopK recall oracle. nanvl
    * routes it to 0.0 ("no similarity") — the guard the streaming
    * faces already carried; null inputs stay null (the
    * null-intolerant contract is unchanged). [[cosineHof]] stays
    * pure (composable building block; callers own the guard). */
  def cosine(a: Column, b: Column): Column =
    nanvl(graft.plans.CosineSimilarity(a, b), lit(0.0))

  /** Brute-force top-k neighbors for each query vector.
    *
    * `queries` must be small (it is broadcast); `base` can be any
    * size: the plan is broadcast-nested-loop + per-query window top-k,
    * i.e. one pass over base with no base-side shuffle of vectors —
    * only (qid, id, score) tuples shuffle for the window.
    */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      k: Int): DataFrame = {
    val scored = base.crossJoin(broadcast(queries))
      .withColumn("score", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** Deterministic random hyperplanes: `nBits` hyperplanes per table,
    * `nTables` tables, components from a fixed-seed RNG generated on
    * the driver and inlined as literals (broadcast with the plan). */
  def hyperplanes(dim: Int, nBits: Int, nTables: Int, seed: Long = 42L)
      : Seq[Seq[Array[Double]]] = {
    val rng = new Random(seed)
    Seq.fill(nTables)(Seq.fill(nBits)(Array.fill(dim)(rng.nextGaussian())))
  }

  /** Sign-bucket code of a vector for one table's hyperplanes.
    * Zero planes (nBits=0) is the degenerate single-bucket code —
    * every vector codes to 0, making the bucketed join exhaustive
    * (the exact-oracle mode of [[annTopK]]). */
  def lshCode(vec: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.size <= 63,
      s"lshCode packs one bit per plane into a Long: max 63 planes, " +
        s"got ${planes.size} — 1L << 64 silently wraps to bit 0 and " +
        "aliases codes, degrading recall with no error")
    if (planes.isEmpty) lit(0L)
    else planes.zipWithIndex.map { case (p, k) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) >= 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    * generation (same sign-LSH tables as annTopK), exact cosine
    * verify >= threshold. Never an all-pairs plan: pairs only form
    * inside (table, code) buckets.
    *
    * Skew guard: buckets larger than `maxBucket` are dropped before
    * the self-join — real corpora carry masses of duplicated or
    * zero-ish embeddings whose bucket would otherwise be an n² stage.
    * Exact dedupe (on a vector digest) is the right tool for that
    * mass; use [[oversizedCodeBuckets]] to count/inspect what was
    * skipped. */
  def cosineNearDupPairs(
      df: DataFrame, // (id, vec)
      threshold: Double,
      dim: Int,
      nBits: Int = -1,
      nTables: Int = 4,
      seed: Long = 42L,
      maxBucket: Int = 10000,
      targetBucket: Int = 256): DataFrame = {
    // nBits = -1 (default): AUTO-SIZE the code space from the corpus
    // count so the EXPECTED bucket holds ~targetBucket vectors. A
    // fixed code space is a scale bug this repo measured, not
    // guessed: at sf0.1 (2k vectors) 6 bits gives ~31-row buckets
    // and the candidate join is trivial, but bucket size grows as
    // N/2^bits while candidate PAIRS grow as its square — at the
    // 100x corpus (200k vectors) the same 6 bits made ~3k-row
    // buckets, slid under the maxBucket hot-bucket cap, and produced
    // ~1.2 BILLION candidate pairs (killed after 1100+ s; 2 s at
    // sf0.1 — the N^2 signature, measured).
    // With bits = log2(N / targetBucket), candidate volume is
    // N * targetBucket * nTables / 2 — linear in N by construction.
    // Recall per table drops as bits grow; spend nTables (linear
    // cost) to buy it back rather than bucket width (quadratic).
    // Explicit nBits >= 0 is honored untouched (0 = single bucket =
    // the brute-force oracle regime).
    val (src, bits) = sizedSource(df, nBits, targetBucket)
    val coded = signCoded(src, dim, bits, nTables, seed)
    // Vectors RIDE THROUGH the bucket self-join and the cosine verify
    // runs INSIDE it, pipelined: the join's probe output streams
    // straight into the codegen'd cosine + threshold filter with no
    // exchange in between, so only the handful of SURVIVING pairs
    // reach a shuffle (the cross-table dedupe). The previous shape —
    // ids-only candidates, dropDuplicates, then two vector re-joins —
    // shuffled the FULL candidate list three times (at the 100x
    // corpus: 3 x ~100M narrow rows) to save carrying vectors
    // through one equi-join whose shuffled input is only
    // N x nTables x ~(vec bytes) (~220 MB at 200k x dim 64 x 4
    // tables). Candidates are identical either way (same buckets,
    // same id_a < id_b), the cosine is the same deterministic double
    // regardless of which table's bucket computed it, and duplicates
    // across tables (<= nTables - 1 extra dots per pair) are cheaper
    // to recompute than to shuffle-dedupe up front.
    // Bucket cap as a WINDOW count over the code shuffle's own
    // (tbl, code) partitioning (r16, the hammingBandedPairs reshape):
    // the old agg+join-back re-evaluated `coded` once per plan leg —
    // 4x per pairs query across both self-join sides — where ONE
    // Exchange hashpartitioning(tbl, code) now feeds the count, the
    // cap filter, and both self-join sides (identical subtree ->
    // exchange reuse), and the join's equi keys are satisfied by the
    // same partitioning. Kept membership unchanged
    // (1 < size <= maxBucket). Same hot-mass trade as
    // hammingBandedPairs' scaladoc: above-cap rows ride this one
    // exchange before dying.
    // null codes (null embeddings) were dropped implicitly by the old
    // inner-join cap; drop them explicitly before the exchange so a
    // null-heavy corpus doesn't shuffle its garbage mass into one
    // null partition per table (results identical — null codes match
    // nothing in the self-join)
    // cap disabled (Int.MaxValue) skips the window — same argument
    // and same measured claw-back as Dedup.hammingBandedPairs:
    // nothing can exceed the cap, singleton buckets self-exclude in
    // the l.id < r.id join, output identical
    val nonNull = coded.filter(col("code").isNotNull)
    val kept =
      if (maxBucket == Int.MaxValue) nonNull
      else nonNull
        .withColumn("__bsz",
          count(lit(1)).over(Window.partitionBy(col("tbl"), col("code"))))
        .filter(col("__bsz") > 1 && col("__bsz") <= maxBucket)
        .drop("__bsz")
    kept.alias("l").join(kept.alias("r"),
        col("l.tbl") === col("r.tbl") && col("l.code") === col("r.code") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        cosine(col("l.vec"), col("r.vec")).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** (tbl, code, size) of the LSH buckets cosineNearDupPairs would
    * DROP at the given cap — the monitoring companion to the skew
    * guard (run it when pair counts look low; each row is a cluster
    * exact-dedupe should own). */
  def oversizedCodeBuckets(
      df: DataFrame,
      dim: Int,
      nBits: Int = -1,
      nTables: Int = 4,
      seed: Long = 42L,
      maxBucket: Int = 10000,
      targetBucket: Int = 256): DataFrame = {
    // same auto-sizing as cosineNearDupPairs, so the monitor reports
    // on the buckets the pair generator would actually use
    val (src, bits) = sizedSource(df, nBits, targetBucket)
    signCoded(src, dim, bits, nTables, seed)
      .groupBy(col("tbl"), col("code"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucket)
  }

  /** Auto-mode input resolution for the sign-LSH pair generators: in
    * auto mode (nBits = -1) the sizing count used to run EAGERLY on
    * the caller's frame and the returned plan then re-scanned it — a
    * derived input (filters, joins, computed vectors) was executed
    * TWICE. A lazy localCheckpoint fixes both sides at once: the
    * sizing count materializes the input into storage blocks, the
    * returned plan (including the bucket self-join, which references
    * the input twice) reads those blocks, and the input's own lineage
    * executes exactly once. Explicit nBits passes the frame through
    * untouched — no storage cost when the caller already resolved the
    * width (index builds, incremental probes). */
  private def sizedSource(
      df: DataFrame, nBits: Int, targetBucket: Int): (DataFrame, Int) =
    if (nBits >= 0) (df, nBits)
    else {
      // Checkpoints, not a raw localCheckpoint: this frame outlives
      // the sizing count (the returned plan feeds pair generation and
      // often connectedComponents' many actions), so a reliable-
      // checkpoint-dir run must cover it — the repo-wide rule
      val src = graft.Checkpoints.lazyCheckpoint(df)
      (src, autoBits(src, -1, targetBucket))
    }

  /** Code-space sizing for the sign-LSH pair generators: explicit
    * nBits >= 0 passes through; -1 sizes bits = log2(count /
    * targetBucket), clamped to [2, 20], so the expected bucket stays
    * ~targetBucket rows as the corpus grows and candidate-pair volume
    * is linear in N (N * targetBucket * nTables / 2), never
    * quadratic. NOTE: auto mode still runs the sizing count EAGERLY
    * at DataFrame-construction time, but over [[sizedSource]]'s lazy
    * checkpoint — so a derived input executes once, not twice.
    * Callers composing the pair generator with its monitoring
    * companion over an expensive input should still resolve
    * [[codeBits]] once themselves and pass the same explicit nBits to
    * both (each auto call checkpoints independently). */
  private[similarity] def autoBits(df: DataFrame, nBits: Int, targetBucket: Int): Int =
    if (nBits >= 0) nBits
    else {
      val n = df.count()
      val raw = math.log(math.max(1.0, n.toDouble / targetBucket)) /
        math.log(2.0)
      math.min(20, math.max(2, raw.ceil.toInt))
    }

  /** The resolved auto-sized code width for `df` — public so an
    * INDEX BUILDER can record the bits its stored codes used and a
    * later incremental probe can pass the identical value (the two
    * sides must agree exactly, like shingleN/bands in the minhash
    * band index). */
  def codeBits(df: DataFrame, targetBucket: Int = 256): Int =
    autoBits(df, -1, targetBucket)

  /** (tbl, code, id) sign-LSH code index of a corpus — the embedding
    * analog of [[graft.dedup.Dedup.minhashBandRows]]: build once over
    * the curated corpus, persist next to it, and incremental batches
    * probe it without ever re-coding the corpus. `nBits` must be
    * explicit (resolve with [[codeBits]] at build time and store it
    * with the index); hyperplanes are deterministic in
    * (dim, nBits, nTables, seed), so a probe with the same parameters
    * reproduces the exact code space. */
  def signCodeIndex(
      df: DataFrame, // (id, vec)
      dim: Int,
      nBits: Int,
      nTables: Int = 4,
      seed: Long = 42L): DataFrame = {
    require(nBits >= 0, "signCodeIndex needs explicit nBits - resolve " +
      "with codeBits(corpus) at build time and store it with the index")
    signCoded(df, dim, nBits, nTables, seed)
      .select(col("tbl"), col("code"), col("id"))
  }

  /** Batch-vs-corpus embedding near-dup pairs against a prebuilt
    * [[signCodeIndex]] — the embedding analog of
    * `Dedup.incrementalNearDupPairs`: only the BATCH is coded (one
    * expression pass over the increment), candidates come from the
    * narrow (tbl, code) equi-join against the stored index, and
    * corpus vectors are re-read ONLY for candidate ids (the
    * candidates-only re-read shape every incremental path here
    * uses). Returns (id_new, id_corpus, cos) with cos >= threshold.
    *
    * Skew: corpus-side code buckets larger than `maxBucket` are
    * excluded, same policy as [[cosineNearDupPairs]] — the
    * identical-vector mass such a bucket implies is exact dedup's
    * job ([[oversizedCodeBuckets]] reports what was skipped).
    * `nBits`/`nTables`/`seed`/`dim` MUST match the index build. */
  def incrementalCosineNearDupPairs(
      corpus: DataFrame, // (id, vec)
      corpusCodes: DataFrame, // (tbl, code, id) from signCodeIndex
      batch: DataFrame, // (id, vec)
      threshold: Double,
      dim: Int,
      nBits: Int,
      nTables: Int = 4,
      seed: Long = 42L,
      maxBucket: Int = 10000): DataFrame = {
    val okBuckets = corpusCodes.groupBy(col("tbl"), col("code"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket)
      .select(col("tbl"), col("code"))
    val cIdx = corpusCodes.join(okBuckets, Seq("tbl", "code"))
      .select(col("tbl"), col("code"), col("id").as("__cid"))
    // batch codes: same deterministic planes as the index build
    val bCoded = signCoded(batch, dim, nBits, nTables, seed)
      .select(col("id").as("id_new"), col("tbl"), col("code"))
    // narrow candidate ids (a pair may surface via several tables -
    // dedupe BEFORE fetching vectors so each pair verifies once)
    val candIds = bCoded.join(cIdx, Seq("tbl", "code"))
      .select(col("id_new"), col("__cid"))
      .dropDuplicates("id_new", "__cid")
    candIds
      .join(batch.select(col("id").as("id_new"), col("vec").as("__bv")),
        Seq("id_new"))
      .join(corpus.select(col("id").as("__cid"), col("vec").as("__cv")),
        Seq("__cid"))
      .withColumn("cos", cosine(col("__bv"), col("__cv")))
      .filter(col("cos") >= threshold)
      .select(col("id_new"), col("__cid").as("id_corpus"), col("cos"))
  }

  /** ROW-LOCAL sign codes of one vector across all tables, as an
    * array<struct<tbl, code>> column over plan-literal hyperplanes —
    * the building block [[signCoded]] explodes, public so a
    * STREAMING micro-batch can code arriving vectors with the exact
    * code space a batch-built [[signCodeIndex]] used (deterministic
    * in (dim, nBits, nTables, seed); no streaming aggregation). */
  def signCodes(vec: Column, dim: Int, nBits: Int, nTables: Int,
      seed: Long = 42L): Column = {
    val planes = hyperplanes(dim, nBits, nTables, seed)
    array(planes.zipWithIndex.map { case (tp, t) =>
      struct(lit(t).as("tbl"), lshCode(vec, tp).as("code"))
    }: _*)
  }

  private def signCoded(df: DataFrame, dim: Int, nBits: Int, nTables: Int,
      seed: Long): DataFrame =
    df.select(col("id"), col("vec"),
      explode(signCodes(col("vec"), dim, nBits, nTables, seed)).as("bk"))
      .select(col("id"), col("vec"), col("bk.tbl"), col("bk.code"))

  /** IVF-style ANN: a k-means coarse quantizer partitions the base
    * vectors into `nLists` cells; each query searches only its
    * `nProbe` nearest cells, with exact cosine re-rank inside.
    *
    * Scale shape: the quantizer fits DRIVER-LOCALLY on a bounded,
    * DETERMINISTIC sample — `orderBy(hash(id)).limit(fitCap)` compiles
    * to TakeOrderedAndProject (per-partition top-N + driver merge), so
    * the exact same rows reach the fit regardless of partitioning,
    * scan order, or executor count, and Lloyd's iterations on the
    * collected <=fitCap unit vectors (a few MB) take milliseconds.
    * The previous distributed MLlib fit was the suite's one
    * nondeterministic stage: `sample().limit()` is first-come, so
    * *which* rows fed k-means was run-dependent and convergence work
    * varied 10-50x (judge-measured 5.7s/66s/250s on identical
    * code+seed). A distributed fit buys nothing below millions of
    * sample rows. Base->cell assignment and query->probe selection
    * are both a row-local argmax over the nLists centroid LITERALS
    * (codegen'd cosine per centroid + a 16-element array sort — no
    * ml.transform stage, no window shuffle); the candidate join is
    * equi on cell with the query side broadcast.
    *
    * Recall levers, metric-consistent (cosine everywhere; k-means
    * runs on L2-normalized vectors, where Euclidean and cosine orders
    * coincide): `nProbe` widens the query's cell search, and
    * `nAssign` spills each base vector into its nAssign nearest cells
    * (redundant inverted lists — nAssign x index size). On corpora
    * with weak cluster structure, single-assignment IVF loses
    * neighbors whose one cell the query ranks low; dual assignment
    * recovers most of that recall for 2x list storage. */
  def ivfTopK(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L,
      nAssign: Int = 2): DataFrame = {
    val cents = coarseCells(base, nLists, seed)
    val assigned = ivfAssign(base, cents, nAssign)
    val qCells = queries.select(col("qid"), col("qvec"),
      explode(nearestCells(cents, col("qvec"), nProbe)).as("cell"))

    // score inside the probe join, dedupe the scalar — annTopK's r16
    // reshape (SortAggregate-with-vectors -> scalar HashAggregate;
    // the cosine is deterministic whichever probed cell surfaced the
    // (qid, id) pair, so first-wins dedupe is order-free)
    val scored = assigned.join(broadcast(qCells), Seq("cell"))
      .select(col("qid"), col("id"),
        cosine(col("qvec"), col("vec")).as("score"))
      .dropDuplicates("qid", "id")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** Build half of a PERSISTED IVF index — the vector analog of
    * [[graft.text.Search.postings]]: fit the coarse quantizer once
    * over the curated corpus and materialize BOTH sides a cold
    * session needs to probe without refitting:
    *
    *   - centroids `(cell, centroid array<float>)`: nLists rows, the
    *     quantizer itself — persist via
    *     [[graft.jobs.AdmissionIndexes.saveIvfCentroids]];
    *   - assignments `(cell, id, vec)`: each base vector spilled into
    *     its nAssign nearest cells (redundant inverted lists — the
    *     recall lever [[ivfTopK]] documents) — persist CELL-BUCKETED
    *     via [[graft.jobs.AdmissionIndexes.saveIvfIndex]], so a probe
    *     scan reads only the probed cells' buckets and the
    *     corpus-sized list never re-shuffles.
    *
    * [[ivfTopK]] refits and re-assigns on EVERY call — right for
    * one-shot exploration, wrong for a standing index at corpus
    * scale (the assignment pass re-reads and re-codes every base
    * vector per query batch). Build once here, probe with
    * [[ivfTopKFromIndex]], grow with [[ivfAssign]] + append. */
  def ivfIndex(
      base: DataFrame, // (id, vec)
      nLists: Int = 16,
      seed: Long = 42L,
      nAssign: Int = 2): (DataFrame, DataFrame) = {
    val cents = coarseCells(base, nLists, seed)
    val spark = base.sparkSession
    import spark.implicits._
    val centDf = cents.map { case (i, c) => (i, c) }
      .toDF("cell", "centroid")
    (centDf, ivfAssign(base, cents, nAssign))
  }

  /** Assign vectors to their nAssign nearest stored cells — the
    * append face of the persisted index: code an arriving batch with
    * the centroids the index was BUILT with (never refit — a refit
    * would silently shift the cell space under the stored
    * assignments) and append the result under the same bucket spec.
    * `cents` comes from [[loadedCentroids]] on the persisted table. */
  def ivfAssign(
      batch: DataFrame, // (id, vec)
      cents: Seq[(Int, Array[Float])],
      nAssign: Int = 2): DataFrame =
    // null vecs are FILTERED, not assigned: a null vec's cell scores
    // are all null but the scored array itself is non-null, so the
    // explode would still emit nAssign dead rows per null vec —
    // inflating cells against the maxCell skew guard and riding the
    // within-cell self-join as join input that can never match
    batch.filter(col("vec").isNotNull).select(
      explode(nearestCells(cents, col("vec"), nAssign)).as("cell"),
      col("id"), col("vec"))

  /** Driver-side centroids of a persisted `(cell, centroid)` table —
    * nLists rows, the same tiny-dim class as the packing offset
    * table. Sorted by cell so the probe's literal array is stable. */
  def loadedCentroids(centroids: DataFrame): Seq[(Int, Array[Float])] =
    centroids.select(col("cell"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq

  /** Probe half of the persisted IVF index: top-k over a prebuilt
    * assignments table + centroid table, NO refit, NO base-side
    * re-assignment — the only per-query work is coding the (small)
    * query side against the stored centroid literals and one
    * candidate join.
    *
    * Plan shape: the probed cells are resolved FIRST (one tiny job
    * over the query table — queries are broadcast-small by the same
    * contract every ANN face here has) and compiled into an `isin`
    * filter on the assignments scan, so a CELL-BUCKETED table
    * ([[graft.jobs.AdmissionIndexes.saveIvfIndex]]) bucket-prunes at
    * planning time: the scan reads only the probed cells' buckets —
    * the same SelectedBucketsCount upgrade the vocabulary-literal
    * BM25 path gets. The query side then joins broadcast; exact
    * cosine re-rank inside the candidates, per-query window top-k.
    * Results are identical to [[ivfTopK]] run with the same
    * centroids (IvfIndexSpec pins it; q_ann_ivf_index_exact gates
    * the exhaustive-probe case against the brute-force oracle). */
  def ivfTopKFromIndex(
      queries: DataFrame, // (qid, qvec)
      assignments: DataFrame, // (cell, id, vec) from ivfIndex/ivfAssign
      centroids: DataFrame, // (cell, centroid) from ivfIndex
      k: Int,
      nProbe: Int = 4): DataFrame = {
    val cents = loadedCentroids(centroids)
    val qCells = queries.select(col("qid"), col("qvec"),
      explode(nearestCells(cents, col("qvec"), nProbe)).as("cell"))
    val probed = qCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // same scalar-dedupe reshape as ivfTopK above
    val scored = assignments
      .filter(col("cell").isin(probed: _*))
      .join(broadcast(qCells), Seq("cell"))
      .select(col("qid"), col("id"),
        cosine(col("qvec"), col("vec")).as("score"))
      .dropDuplicates("qid", "id")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** The IVF coarse quantizer, extracted so IVF and IVF-PQ share one
    * fit: deterministic bounded sample -> driver-local Lloyd's ->
    * (cell index, float centroid) pairs.
    *
    * L2-normalizes the quantizer's feature space (fitting on raw
    * magnitudes splits cells by vector length, which cosine search
    * doesn't care about). Deterministic bounded fit sample:
    * top-fitCap rows by hash of id (plus id tiebreak) — a
    * TakeOrderedAndProject, never a global sort or a counting pass,
    * and the same rows win on every run; normalization happens AFTER
    * the limit so only the fit rows pay for feature construction.
    * The cap is DIMENSION-AWARE: the collected sample is dim doubles
    * per row, so a row cap alone scales driver memory linearly with
    * embedding width (nLists*2000 rows at d=4096 is ~1 GB). Budget
    * ~64 MB of fit sample instead: rows = budget/(8*dim), floored at
    * nLists*50 so every cell still sees enough points to place a
    * center, ceilinged at the d-independent row cap. If the cap
    * undershoots on a tiny base, the fit just returns fewer than
    * nLists centers and every cell gets probed — still correct. */
  private[similarity] def coarseCells(
      base: DataFrame, nLists: Int, seed: Long): Seq[(Int, Array[Float])] = {
    val (_, pts) = unitSample(base, centers = nLists)
    coarseCellsFromPoints(pts, nLists, seed)
  }

  /** The k-means half of [[coarseCells]], over an already-collected
    * sample — lets a composed index build (IVF-PQ) draw ONE sample
    * and fit both quantizers from it. */
  private[similarity] def coarseCellsFromPoints(
      pts: Array[Array[Double]], nLists: Int,
      seed: Long): Seq[(Int, Array[Float])] =
    localKMeans(pts, nLists, maxIter = 10, seed).zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat)) }.toSeq

  /** The deterministic bounded fit sample EVERY driver-local
    * quantizer fit draws from (IVF's coarse cells and PQ's subspace
    * codebooks — one definition, no drift): (dim, unit-normalized
    * finite points of the probed width). `centers` sizes the cap:
    * the d-independent row ceiling scales with it, the 64 MB byte
    * budget divides by the probed dim, and the floor keeps ~50
    * points per center. */
  private[similarity] def unitSample(
      base: DataFrame, centers: Int): (Int, Array[Array[Double]]) = {
    // the file's own norm kernel (dot's zip_with fold is value- and
    // order-identical to a squared transform) — one definition
    val unitVec = zip_with(col("vec"),
      array_repeat(norm(col("vec")), size(col("vec"))),
      (x, nn) => x.cast("double") / nn)
    val dim = base.filter(col("vec").isNotNull).limit(1)
      .select(size(col("vec"))).collect()
      .headOption.filter(!_.isNullAt(0)).map(_.getInt(0)).getOrElse(1).max(1)
    val fitBudgetBytes = 64L << 20
    val byteRows = fitBudgetBytes / (8L * dim)
    // the ~50-points-per-center quality floor may exceed the byte
    // budget, but never UNBOUNDEDLY: auto-k on a 100M-row corpus
    // asks ~390k centers = ~20M rows = ~120 GB collected to the
    // driver. Past 4x the budget the fit cannot be driver-sized —
    // cap there with a loud note; corpora that big fit the quantizer
    // once and reuse it via the stored-centroid/fromAssignments
    // faces (the documented 100-TB posture), they do not refit
    // inline per run.
    val wanted = math.max(centers * 50L, byteRows)
    val hardCap = 4L * math.max(byteRows, 20000L)
    if (wanted > hardCap)
      System.err.println(s"[similarity] unitSample: $centers centers " +
        s"want $wanted fit rows; driver budget caps the sample at " +
        s"$hardCap — centroids will be under-sampled (< ~50 points " +
        "per center). Fit once and reuse stored centroids " +
        "(fromAssignments) for corpora this large")
    val fitCap = math.min(
      math.max(centers * 2000, 20000).toLong,
      math.min(wanted, hardCap)).toInt
    val pts = base
      .orderBy(xxhash64(col("id").cast("string")), col("id"))
      .limit(fitCap)
      .select(unitVec.as("uvec"))
      .collect().iterator
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Double](0).toArray)
      .filter(p => p != null && p.length == dim &&
        p.forall(d => !d.isNaN && !d.isInfinite))
      .toArray
    (dim, pts)
  }

  /** Public face of [[nearestCells]] for the streaming lookup
    * ([[graft.streaming.EventStream.streamingIvfTopK]]): the probe
    * cells of a vector column over stored centroids, ROW-LOCAL (the
    * centroids are plan literals), so a streaming micro-batch probes
    * with the exact cell space the index was built with — the same
    * no-streaming-aggregation property [[signCodes]] gives the
    * sign-LSH family. */
  def probeCells(cents: Seq[(Int, Array[Float])], vecCol: Column,
      n: Int): Column =
    nearestCells(cents, vecCol, n)

  /** The n nearest cells of a vector column — centroids inline as
    * literals (tiny, they ship with the plan), one row-local
    * sorted-array scan, same metric both sides, no shuffle. */
  private[similarity] def nearestCells(
      cents: Seq[(Int, Array[Float])], vecCol: Column, n: Int): Column = {
    // empty centroid set (empty corpus, or a fit whose every point
    // was null/zero-norm/non-finite): no cells to probe. Return a
    // typed empty array — CreateArray(Nil) is a NullType array whose
    // getField("cell") fails ANALYSIS — so downstream explodes drop
    // every row and empty input yields empty output, the same
    // empty-delta convention the rest of the file pins
    if (cents.isEmpty) return array().cast("array<int>")
    val scored = array(cents.map { case (i, c) =>
      struct(cosine(vecCol, array(c.map(lit(_)): _*)).as("s"),
        lit(i).as("cell"))
    }: _*)
    transform(slice(sort_array(scored, asc = false), 1, n),
      s => s.getField("cell"))
  }

  /** Deterministic driver-local Lloyd's k-means with seeded k-means++
    * init. Input is the bounded fit sample (<= fitCap rows, a few MB)
    * — at that size a single-threaded fit is milliseconds and, unlike
    * a distributed fit, produces byte-identical centroids on every
    * run given the same (ordered) points and seed. Returns
    * min(k, points) centers. */
  private[similarity] def localKMeans(
      points: Array[Array[Double]],
      k: Int,
      maxIter: Int,
      seed: Long): Array[Array[Double]] = {
    val n = points.length
    if (n == 0) return Array.empty
    val dim = points(0).length
    val kk = math.min(k, n)
    val rng = new Random(seed)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ seeding: next center drawn proportional to squared
    // distance from the nearest chosen center.
    val centers = scala.collection.mutable.ArrayBuffer(points(rng.nextInt(n)))
    val minD = Array.fill(n)(Double.MaxValue)
    while (centers.size < kk) {
      val last = centers.last
      var total = 0.0
      var i = 0
      while (i < n) {
        val d = d2(points(i), last)
        if (d < minD(i)) minD(i) = d
        total += minD(i)
        i += 1
      }
      if (total <= 0) centers += points(rng.nextInt(n)) // degenerate: all-duplicate sample
      else {
        var r = rng.nextDouble() * total
        var j = 0
        while (j < n - 1 && r > minD(j)) { r -= minD(j); j += 1 }
        centers += points(j)
      }
    }
    // Lloyd iterations until convergence or maxIter.
    var cs = centers.map(_.clone).toArray
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var i = 0
      while (i < n) {
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < kk) {
          val d = d2(points(i), cs(c)); if (d < bd) { bd = d; best = c }; c += 1
        }
        counts(best) += 1
        val s = sums(best)
        var j = 0
        while (j < dim) { s(j) += points(i)(j); j += 1 }
        i += 1
      }
      moved = false
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          val nc = new Array[Double](dim)
          var j = 0
          while (j < dim) { nc(j) = sums(c)(j) / counts(c); j += 1 }
          if (d2(nc, cs(c)) > 1e-12) moved = true
          cs(c) = nc
        }
        c += 1
      }
      iter += 1
    }
    cs
  }

  /** ANN top-k via multi-table sign-LSH with multi-probe: candidates
    * are base vectors sharing a (table, bucket) with the query's code
    * OR any 1-bit flip of it (probing trades a few more equi-join
    * rows for recall without widening buckets). Exact cosine re-rank
    * inside the candidate set. The join is equi on (table, code) —
    * hash-partitionable, never all-pairs.
    */
  def annTopK(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      dim: Int,
      k: Int,
      nBits: Int = 8,
      nTables: Int = 4,
      multiProbe: Boolean = true,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, nBits, nTables, seed)
    def coded(df: DataFrame, vecCol: String, idCols: Seq[String],
        probe: Boolean): DataFrame = {
      val tableCodes = planes.zipWithIndex.flatMap { case (tp, t) =>
        val code = lshCode(col(vecCol), tp)
        val probes =
          if (probe) (0 until nBits).map(b => code.bitwiseXOR(lit(1L << b)))
          else Nil
        (code +: probes).map(c => struct(lit(t).as("tbl"), c.as("code")))
      }
      df.select(idCols.map(col) :+
        explode(array(tableCodes: _*)).as("bk"): _*)
        .select(idCols.map(col) :+ col("bk.tbl") :+ col("bk.code"): _*)
    }
    val qCoded = coded(queries, "qvec", Seq("qid", "qvec"), multiProbe)
    val bCoded = coded(base, "vec", Seq("id", "vec"), probe = false)
    // score INSIDE the candidate join, dedupe the scalar after (r16):
    // dropDuplicates over rows still carrying both vectors ran as a
    // SortAggregate (array columns have no hash-agg buffer) and
    // shuffled 2 x dim floats per candidate; the cosine is the same
    // deterministic double whichever (tbl, code) surfaced the pair —
    // cosineNearDupPairs' standing argument — so scoring first makes
    // the dedupe a scalar-buffer HashAggregate and the dedupe
    // exchange carries (qid, id, score) only. Results identical.
    val scored = bCoded.join(broadcast(qCoded), Seq("tbl", "code"))
      .select(col("qid"), col("id"),
        cosine(col("qvec"), col("vec")).as("score"))
      .dropDuplicates("qid", "id")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** The semanticDedup auto-sizing formula, exposed so measurement
    * harnesses report the SAME cell count the operator actually uses
    * rather than re-deriving (and silently diverging from) it. */
  def autoCells(n: Long, targetCell: Int = 256): Int =
    math.max(1, math.ceil(n.toDouble / targetCell).toInt)

  /** Semantic deduplication (public literature: Abbas et al.,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): cluster the embedding space
    * with the SAME deterministic coarse quantizer the IVF family
    * fits, form cosine pairs >= `threshold` WITHIN each cluster only
    * (the paper's own cut — cross-cluster semantic dups are
    * deliberately out of comparison scope, which is what makes the
    * pair volume tractable at corpus scale), connect components over
    * the pairs, and keep ONE representative per group: the minimum
    * id, matching the component label [[graft.dedup.Dedup
    * .connectedComponents]] already converges to, so keeper election
    * is a filter, not another aggregate.
    *
    * Output: one row per SURVIVING document — `(id, n_members)`
    * where n_members counts the semantic group it represents
    * (1 for documents with no in-cluster dup). Join back to the
    * corpus on id for the kept rows' payloads.
    *
    * Scale shape: every stage is an existing audited kernel —
    * the bounded driver-local fit ([[coarseCells]]), the row-local
    * assignment explode ([[ivfAssign]], nAssign=1: SemDeDup
    * partitions, it does not spill), a within-cell self-join whose
    * volume is Σ cell² bounded by the `maxCell` guard (cells above
    * it skip PAIRING and their rows pass through — the maxBucket
    * posture of the LSH family, with the skip LOGGED and the cells
    * reportable via [[oversizedSemanticCells]]; size `nLists` ~
    * N/targetCell at real scale, or run
    * [[semanticDedupFromAssignments]] off a persisted IVF index's
    * cells — the fit-once/assign-forever face), and the
    * O(log d) star-contraction CC. The exactness regime is
    * `nLists = 1, maxCell = Int.MaxValue`: one cell makes the
    * within-cell join ALL pairs, so the result equals brute-force
    * closure dedup by construction (q_semantic_dedup_exact's
    * oracle).
    *
    * `nLists = -1` (default) AUTO-SIZES the cluster count as
    * ceil(N / targetCell) — the autoBits discipline: expected cell
    * width stays ~targetCell as the corpus grows, so within-cell
    * pair volume is N x targetCell / 2 — LINEAR in N (a fixed
    * nLists makes cells N/nLists wide and pair volume quadratic,
    * the exact shape the 100x run caught in the LSH family). The
    * SemDeDup paper sizes k the same way (clusters ∝ corpus). The
    * sizing count runs over a lazy checkpoint, so a derived input
    * executes once. */
  def semanticDedup(
      df: DataFrame, // (id, vec)
      threshold: Double,
      nLists: Int = -1,
      seed: Long = 42L,
      maxCell: Int = 10000,
      targetCell: Int = 256): DataFrame = {
    // ONE lazy checkpoint for BOTH regimes: the input is referenced
    // by the fit sample, the assignment pass, and the singletons
    // anti-join, so an expensive derived lineage must execute once.
    // Routed through Checkpoints so a reliable-checkpoint-dir run
    // covers this frame too — a materialized lazy localCheckpoint is
    // NOT recomputable after executor loss, and this frame outlives
    // connectedComponents' many per-round actions.
    val src = graft.Checkpoints.lazyCheckpoint(df)
    // (null-vec rows never reach the assignments — ivfAssign filters
    // them — but idUniverse = src below keeps them as survivors: no
    // evidence, no drop, the same convention as Dedup's null text)
    val k = if (nLists >= 1) nLists else autoCells(src.count(), targetCell)
    val cents = coarseCells(src, k, seed)
    // assignments are single-cell by construction here, so the
    // uniqueness validation the public fromAssignments face runs is
    // skipped — it would be a pure extra pass. The singleton universe
    // is src, NOT the assignments: a null-vec row never assigns
    // (ivfAssign filters it) but must still pass through as a
    // survivor — the same no-data-loss convention Dedup's null-text
    // handling pins.
    semanticDedupBody(ivfAssign(src, cents, nAssign = 1), threshold,
      maxCell, checkUnique = false, idUniverse = Some(src.select(col("id"))))
  }

  /** SemDeDup off PRECOMPUTED cell assignments — the
    * fit-once/assign-forever face the 100-TB posture runs: build (or
    * load) a persisted IVF index once ([[ivfIndex]] /
    * [[graft.jobs.AdmissionIndexes.saveIvfIndex]]), assign arriving
    * batches against its stored centroids ([[ivfAssign]] +
    * [[loadedCentroids]]), and dedup reads the `(cell, id, vec)`
    * assignments table directly — no refit, no re-assignment, and on
    * a CELL-BUCKETED table the within-cell self-join needs no
    * exchange at all (the scan is already partitioned on the join
    * key). Results are identical to [[semanticDedup]] run at the same
    * cell count/seed (SimilaritySpec pins the parity).
    *
    * Assignments MUST be single-assignment (`nAssign = 1`): SemDeDup
    * partitions the corpus, it does not spill. A multi-assigned index
    * (the ANN recall lever) holds each id in several cells, which
    * would silently inflate group sizes and duplicate survivor rows —
    * refused loudly here (one distinct-count pass over the pruned
    * (id) projection; skip belongs only to the inline builder, which
    * assigns nAssign=1 by construction). */
  def semanticDedupFromAssignments(
      assignments: DataFrame, // (cell, id, vec), nAssign=1
      threshold: Double,
      maxCell: Int = 10000): DataFrame =
    semanticDedupBody(assignments, threshold, maxCell, checkUnique = true)

  /** (cell, csz) of the cells [[semanticDedup]] would SKIP pairing at
    * the given cap — the monitoring companion to the maxCell skew
    * guard, mirroring [[oversizedCodeBuckets]] /
    * [[graft.dedup.Dedup.oversizedMinhashBuckets]]: same fit, same
    * auto-sizing, same assignment, so it reports on exactly the cells
    * the operator skips. Each row is a duplicate-concentrated region
    * whose near-dups silently SURVIVE the cap (auto-sizing makes
    * overflow unlikely on well-spread data, but a duplicate-heavy
    * embedding space — dedup's own target — concentrates mass); run
    * it when survivor counts look high, then either raise maxCell for
    * those regions or route their rows through exact dedup. */
  def oversizedSemanticCells(
      df: DataFrame, // (id, vec)
      nLists: Int = -1,
      seed: Long = 42L,
      maxCell: Int = 10000,
      targetCell: Int = 256): DataFrame = {
    val src = graft.Checkpoints.lazyCheckpoint(df)
    val k = if (nLists >= 1) nLists else autoCells(src.count(), targetCell)
    val cents = coarseCells(src, k, seed)
    ivfAssign(src, cents, nAssign = 1)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("csz"))
      .filter(col("csz") > maxCell)
  }

  private def semanticDedupBody(
      assignments: DataFrame,
      threshold: Double,
      maxCell: Int,
      checkUnique: Boolean,
      idUniverse: Option[DataFrame] = None): DataFrame = {
    val assigned = graft.Checkpoints.lazyCheckpoint(assignments)
    // per-cell sizes: one row per cell — drives the pairing guard AND
    // the skip report below from a single aggregate. Lazy: with the
    // cap disabled and no uniqueness check to run, no consumer ever
    // materializes it (the exact-oracle points skip three jobs —
    // sizes aggregate, over-cap probe, ok-cells join)
    lazy val cellSizes = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("csz"))
      .localCheckpoint()
    if (checkUnique) {
      // coalesce: sum over an empty sizes frame is null (an empty
      // assignments table — e.g. a delta that admitted nothing — must
      // yield an empty result, not an NPE)
      val total = cellSizes
        .agg(coalesce(sum(col("csz")), lit(0L))).collect()(0).getLong(0)
      val distinctIds = assigned.select(col("id")).distinct().count()
      require(distinctIds == total,
        s"semanticDedupFromAssignments needs single-assignment " +
          s"(nAssign=1) input: got $total assignment rows over " +
          s"$distinctIds distinct ids — a multi-assigned ANN index " +
          "would inflate group sizes and duplicate survivors; " +
          "re-assign the corpus with ivfAssign(.., nAssign = 1)")
    }
    // cells above the guard (or trivially of size 1) skip pairing;
    // their rows survive as singletons. NO SILENT CAP: the skipped
    // count/mass is logged here (driver-side, over the nLists-row
    // sizes frame — never a data scan), and oversizedSemanticCells
    // reports the cells themselves.
    // Cap disabled (Int.MaxValue — the exact-oracle regime) skips the
    // guard outright: no cell can exceed the cap (the log is provably
    // empty) and a size-1 cell self-excludes in the l.id < r.id join,
    // so the output is identical while the sizes aggregate + ok-cells
    // join disappear — the r17 uncapped-skip argument shared with the
    // three window-cap kernels.
    val kept =
      if (maxCell == Int.MaxValue) assigned
      else {
        val overRow = cellSizes.filter(col("csz") > maxCell)
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("csz")), lit(0L)).as("mass"))
          .collect()(0)
        if (overRow.getLong(0) > 0)
          System.err.println(s"[semantic-dedup] maxCell=$maxCell skipped " +
            s"${overRow.getLong(0)} oversized cell(s) holding " +
            s"${overRow.getLong(1)} rows — their near-dups pass through " +
            "as survivors; see Similarity.oversizedSemanticCells")
        val okCells = cellSizes
          .filter(col("csz") > 1 && col("csz") <= maxCell)
          .select(col("cell"))
        assigned.join(okCells, Seq("cell"))
      }
    // vectors ride through the self-join, cosine verifies inside it
    // (the pipelined shape cosineNearDupPairs measured 9.3x faster
    // than ids-only + re-join at the 100x corpus)
    val pairs = kept.alias("l").join(kept.alias("r"),
        col("l.cell") === col("r.cell") && col("l.id") < col("r.id"))
      .filter(cosine(col("l.vec"), col("r.vec")) >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    val labels = graft.dedup.Dedup
      .connectedComponents(pairs, "id_a", "id_b") // (id, cluster=min id)
    val sizes = labels.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))
      .withColumnRenamed("cluster", "id")
    val reps = labels.filter(col("id") === col("cluster"))
      .select(col("id"))
      .join(sizes, Seq("id"))
    val singletons = idUniverse.getOrElse(assigned.select(col("id")))
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .withColumn("n_members", lit(1L))
    reps.unionByName(singletons)
  }
}
