package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{PqAdc, PqAdcTable, PqEncode}

/** Product quantization for embedding search — the memory side of
  * the ANN story (public literature: Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011). The
  * d-dim vector space splits into `m` subspaces of d/m dims; each
  * subspace gets its own k-center codebook, and a base vector is
  * stored as m small code indices — 8 bytes of codes standing in
  * for 256 bytes of floats at (m=8, d=64). Queries score candidates
  * with ASYMMETRIC DISTANCE (ADC): one m x k table of
  * query-to-centroid dot products per query (built row-local on
  * executors by [[graft.plans.PqAdcTable]]), then every candidate
  * costs m table lookups instead of a d-wide float dot product.
  *
  * Scale shape, mirroring [[Similarity.ivfTopK]]'s decisions:
  *  - codebooks fit DRIVER-LOCALLY on the same deterministic bounded
  *    sample (TakeOrderedAndProject by hashed id; dimension-aware
  *    byte budget) with the same seeded Lloyd's — byte-identical
  *    codebooks every run;
  *  - encoding is one codegen'd expression pass over base
  *    ([[graft.plans.PqEncode]]), run once at index-build time;
  *  - the query side's ADC tables are built DISTRIBUTED
  *    ([[graft.plans.PqAdcTable]], row-local) — the query frame never
  *    materializes on the driver; search then broadcasts it (the ANN
  *    family's broadcastable-Q assumption, failing loudly at Spark's
  *    broadcast limit rather than silently OOMing the driver) and the
  *    base side streams its codes through [[graft.plans.PqAdc]] — no
  *    base-side shuffle of vectors, only (qid, id, score) tuples move
  *    for the top-k window;
  *  - the ADC pass keeps `refine * k` candidates per query, which
  *    re-rank by EXACT cosine on the true vectors (the standard
  *    PQ-then-refine cascade) — so PQ approximation error affects
  *    only which candidates reach the exact pass, never the final
  *    scores. `refine = Int.MaxValue` is the explicit no-cut
  *    sentinel: every row reaches the exact pass and the result
  *    equals brute force by construction at ANY base size (the
  *    oracle's exactness regime, q_ann_pq_exact) — never encode
  *    exactness as a large-looking constant a bigger corpus can
  *    silently outgrow.
  *
  * Metric: cosine via unit-normalization everywhere (fit, encode,
  * tables), consistent with the rest of the similarity family. */
object Pq {

  /** Driver-fitted codebooks: `flat((j*k + c)*dsub + t)` = coordinate
    * t of center c of subspace j. Subspaces with fewer than k
    * distinct sample points pad by repeating their last real center;
    * argmin's strict `<` keeps the first copy, so pad slots are
    * unreachable from [[graft.plans.PqEncode]]. */
  final case class Codebooks(m: Int, k: Int, dsub: Int, flat: Array[Float])

  /** Fit m per-subspace codebooks on a deterministic bounded sample
    * of unit-normalized base vectors. `base` must carry (id, vec). */
  def fit(
      base: DataFrame,
      m: Int,
      k: Int = 16,
      seed: Long = 42L): Codebooks = {
    // the SHARED deterministic bounded sample (Similarity.unitSample
    // — the same definition the IVF coarse fit draws from, so the two
    // sampling policies cannot drift apart)
    val (dim, pts) = Similarity.unitSample(base, centers = k)
    fitFromSample(dim, pts, m, k, seed)
  }

  /** The codebook-fit half of [[fit]] over an already-collected
    * sample — lets a composed index build (IVF-PQ) draw ONE sample
    * for both quantizers. */
  private[similarity] def fitFromSample(
      dim: Int,
      pts: Array[Array[Double]],
      m: Int,
      k: Int,
      seed: Long): Codebooks = {
    // a real width smaller than m must REJECT loudly, never be padded
    // up: a silently-degenerate codebook would null out every code
    require(dim >= m && dim % m == 0,
      s"vector dim $dim must be a positive multiple of m=$m")
    val dsub = dim / m
    val flat = new Array[Float](m * k * dsub)
    var j = 0
    while (j < m) {
      val sub = pts.map(p => java.util.Arrays.copyOfRange(p, j * dsub, (j + 1) * dsub))
      val centers = Similarity.localKMeans(sub, k, maxIter = 15, seed + j)
      var c = 0
      while (c < k) {
        // pad by repeating the last real center (never reachable:
        // equal distance resolves to the earlier index)
        val src = if (centers.isEmpty) new Array[Double](dsub)
          else centers(math.min(c, centers.length - 1))
        var t = 0
        while (t < dsub) {
          flat((j * k + c) * dsub + t) = src(t).toFloat
          t += 1
        }
        c += 1
      }
      j += 1
    }
    Codebooks(m, k, dsub, flat)
  }

  /** m PQ codes for a float-vector column (codegen'd expression;
    * resolves through the registry, codebook as a plan literal). */
  def encode(vec: Column, cb: Codebooks): Column =
    call_function("pq_encode", vec, lit(cb.flat),
      lit(cb.m), lit(cb.k), lit(cb.dsub))

  /** ADC score of a codes column against a per-row table column. */
  def adc(codes: Column, table: Column, cb: Codebooks): Column =
    call_function("pq_adc", codes, table, lit(cb.k))

  /** The per-query ADC table: entry (j, c) is the dot product of the
    * UNIT query's subspace j with center c — summing m looked-up
    * entries reconstructs the query·(reconstructed base) dot product,
    * i.e. approximate cosine of unit vectors. Column form of the
    * codegen'd [[graft.plans.PqAdcTable]] expression; null or
    * wrong-width vectors yield null. */
  def adcTableCol(qvec: Column, cb: Codebooks): Column =
    call_function("pq_adc_table", qvec, lit(cb.flat),
      lit(cb.m), lit(cb.k), lit(cb.dsub))

  /** Driver-side entry to the same static kernel the expression runs
    * (kept for spec-level parity checks). */
  private[similarity] def adcTable(q: Array[Float], cb: Codebooks): Array[Float] =
    PqAdcTable.table(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(q),
      cb.flat, cb.m, cb.k, cb.dsub)

  /** (qid, qvec, qtab): the query side with per-query ADC tables,
    * built DISTRIBUTED by [[adcTableCol]] — no driver materialization,
    * so the query frame keeps arbitrary size (the search itself still
    * broadcasts it under the ANN family's broadcastable-Q assumption,
    * where an oversized Q fails Spark's broadcast limit with a clear
    * message instead of a silent driver OOM at table-build time).
    * Null or wrong-width query vectors are DROPPED here — they have
    * no well-defined neighbors, and the other ANN variants
    * null-propagate the same rows out of every window. */
  private def queryTableFrame(queries: DataFrame, cb: Codebooks): DataFrame =
    queries
      .select(col("qid"), col("qvec"),
        adcTableCol(col("qvec"), cb).as("qtab"))
      .filter(col("qtab").isNotNull)

  /** ADC cut (`refine * k` candidates per query; `Int.MaxValue` is
    * the no-cut sentinel) then exact cosine re-rank (k). The cut's
    * window shuffles ONLY (qid, id, adc) — wide columns never cross
    * the exchange; the surviving candidates (refine*k per query,
    * tiny) broadcast back onto `base` to fetch true vectors for the
    * exact pass — the re-read-candidates-only shape the incremental
    * dedup paths use.
    *
    * The no-cut sentinel changes SHAPE, not just bound: with every
    * candidate surviving, the "cut" is |Q|x|base| rows, so ranking it
    * (an O(N log N) per-query sort that keeps everything) and
    * broadcasting it (driver collect of the whole pair set) would
    * both be scale bugs. The exact regime therefore skips the window
    * and ships the pair frame through an ordinary shuffle join —
    * every row reaches the exact pass, equal to brute force by
    * construction at ANY base size, operationally too. */
  private def adcThenRefine(
      cand: DataFrame, // (qid, id, codes, qtab)
      base: DataFrame, // (id, vec)
      qdf: DataFrame, // (qid, qvec, qtab)
      cb: Codebooks,
      k: Int,
      refine: Int,
      dedupe: Boolean): DataFrame = {
    val exact = refine == Int.MaxValue
    val narrow0 = cand.select(col("qid"), col("id"),
      adc(col("codes"), col("qtab"), cb).as("adc"))
    val narrow = if (dedupe) narrow0.dropDuplicates("qid", "id") else narrow0
    val adcRanked = Window.partitionBy(col("qid"))
      .orderBy(col("adc").desc, col("id"))
    val cut =
      if (exact) narrow.select(col("qid"), col("id"))
      else narrow
        .withColumn("arank", row_number().over(adcRanked))
        .filter(col("arank") <= refine.toLong * k)
        .select(col("qid"), col("id"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    base.select(col("id"), col("vec"))
      .join(if (exact) cut else broadcast(cut), Seq("id"))
      .join(broadcast(qdf.select(col("qid"), col("qvec"))), Seq("qid"))
      .withColumn("score", Similarity.cosine(col("qvec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  def pqTopK(
      queries: DataFrame, // (qid, qvec: array<float>)
      base: DataFrame, // (id, vec: array<float>)
      k: Int,
      m: Int = 8,
      kCodes: Int = 16,
      refine: Int = 4,
      seed: Long = 42L): DataFrame = {
    val cb = fit(base, m, kCodes, seed)
    val qdf = queryTableFrame(queries, cb)
    val coded = base.select(col("id"), encode(col("vec"), cb).as("codes"))
    adcThenRefine(
      coded.crossJoin(broadcast(qdf.select(col("qid"), col("qtab")))),
      base, qdf, cb, k, refine, dedupe = false)
  }

  /** IVF-PQ: the coarse quantizer ([[Similarity.coarseCells]], the
    * exact fit ivfTopK uses) prunes candidates to the query's nProbe
    * cells via an equi-join on cell, and PQ's ADC scores what
    * remains — cell pruning bounds the candidate COUNT
    * (~N*nProbe/nLists per query instead of N), ADC bounds the cost
    * PER candidate (m lookups instead of a d-wide dot). Exactness
    * regime: nProbe >= nLists and refine covering the base probes
    * every cell and re-ranks every row — equal to brute force by
    * construction (q_ann_ivfpq_exact's oracle). */
  /** Build half of a PERSISTED IVF-PQ index — the composed analog of
    * [[Similarity.ivfIndex]]: ONE deterministic sample fits both
    * quantizers, and the three frames a cold session needs
    * materialize together:
    *
    *   - centroids `(cell, centroid)`: the coarse quantizer
    *     ([[graft.jobs.AdmissionIndexes.saveIvfCentroids]]);
    *   - codebooks: ONE row `(m, k, dsub, flat)` — the PQ quantizer
    *     ([[graft.jobs.AdmissionIndexes.savePqCodebooks]]);
    *   - assignments `(cell, id, codes)`: each base vector's nAssign
    *     cells with its m one-byte PQ codes and NO float vector —
    *     the memory win of PQ is exactly that the stored index is
    *     codes, ~d*4/m smaller than the vectors
    *     ([[graft.jobs.AdmissionIndexes.saveIvfIndex]], cell-bucketed;
    *     the same key spec — the probe-side plumbing is shared).
    *
    * True vectors stay in the corpus table and are re-read for the
    * exact refine's CANDIDATES only, so they never duplicate into
    * the index. Probe with [[ivfPqTopKFromIndex]]; grow with
    * [[ivfPqAssign]] + append. */
  def ivfPqIndex(
      base: DataFrame, // (id, vec)
      nLists: Int = 16,
      m: Int = 8,
      kCodes: Int = 16,
      seed: Long = 42L,
      nAssign: Int = 2): (DataFrame, DataFrame, DataFrame) = {
    val (dim, pts) = Similarity.unitSample(base,
      centers = math.max(nLists, kCodes))
    val cents = Similarity.coarseCellsFromPoints(pts, nLists, seed)
    val cb = fitFromSample(dim, pts, m, kCodes, seed)
    val spark = base.sparkSession
    import spark.implicits._
    val centDf = cents.map { case (i, c) => (i, c) }
      .toDF("cell", "centroid")
    val cbDf = Seq((cb.m, cb.k, cb.dsub, cb.flat.toSeq))
      .toDF("m", "k", "dsub", "flat")
    (centDf, cbDf, ivfPqAssign(base, cents, cb, nAssign))
  }

  /** Code + assign vectors against the STORED quantizers — the
    * append face (never refit: a refit would shift both the cell
    * space and the code space under the stored assignments). */
  def ivfPqAssign(
      batch: DataFrame, // (id, vec)
      cents: Seq[(Int, Array[Float])],
      cb: Codebooks,
      nAssign: Int = 2): DataFrame =
    batch.select(
      explode(Similarity.probeCells(cents, col("vec"), nAssign))
        .as("cell"),
      col("id"), encode(col("vec"), cb).as("codes"))

  /** Driver-side codebooks of a persisted 1-row (m, k, dsub, flat)
    * table. */
  def loadedCodebooks(cbDf: DataFrame): Codebooks = {
    val r = cbDf.select(col("m"), col("k"), col("dsub"), col("flat"))
      .collect()(0)
    Codebooks(r.getInt(0), r.getInt(1), r.getInt(2),
      r.getSeq[Float](3).toArray)
  }

  /** Probe half of the persisted IVF-PQ index: ADC-score the probed
    * cells' stored codes, exact-cosine refine against the corpus
    * vector table — NO refit, no base-side encode, and the
    * cell-bucketed assignments scan bucket-prunes to the probed
    * cells (same `isin` upgrade as
    * [[Similarity.ivfTopKFromIndex]]). `baseVecs` is the corpus
    * (id, vec) table the refine re-reads candidates from — vectors
    * live once, in the corpus, never in the index. Results equal
    * [[ivfPqTopK]] at the same quantizers (PqSpec pins it; the
    * exhaustive regime equals brute force by construction). */
  def ivfPqTopKFromIndex(
      queries: DataFrame, // (qid, qvec)
      assignments: DataFrame, // (cell, id, codes) from ivfPqIndex
      centroids: DataFrame, // (cell, centroid)
      codebooks: DataFrame, // 1-row (m, k, dsub, flat)
      baseVecs: DataFrame, // (id, vec) — the corpus vector table
      k: Int,
      nProbe: Int = 4,
      refine: Int = 4): DataFrame = {
    val cb = loadedCodebooks(codebooks)
    val cents = Similarity.loadedCentroids(centroids)
    val qdf = queryTableFrame(queries, cb)
    val qCells = qdf
      .select(col("qid"), col("qvec"), col("qtab"),
        explode(Similarity.probeCells(cents, col("qvec"), nProbe))
          .as("cell"))
    val probed = qCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    adcThenRefine(
      assignments
        .filter(col("cell").isin(probed: _*))
        .join(broadcast(qCells.select(col("qid"), col("qtab"),
          col("cell"))), Seq("cell")),
      baseVecs, qdf, cb, k, refine, dedupe = true)
  }

  def ivfPqTopK(
      queries: DataFrame, // (qid, qvec: array<float>)
      base: DataFrame, // (id, vec: array<float>)
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      kCodes: Int = 16,
      refine: Int = 4,
      seed: Long = 42L,
      nAssign: Int = 2): DataFrame = {
    // ONE deterministic sample feeds both quantizers (cap sized for
    // the larger of the two center counts — a superset sample is
    // still deterministic and serves both fits)
    val (dim, pts) = Similarity.unitSample(base,
      centers = math.max(nLists, kCodes))
    val cents = Similarity.coarseCellsFromPoints(pts, nLists, seed)
    val cb = fitFromSample(dim, pts, m, kCodes, seed)
    val qdf = queryTableFrame(queries, cb)
    val assigned = base.select(col("id"),
      encode(col("vec"), cb).as("codes"),
      explode(Similarity.nearestCells(cents, col("vec"), nAssign)).as("cell"))
    val qCells = qdf
      .select(col("qid"), col("qvec"), col("qtab"),
        explode(Similarity.nearestCells(cents, col("qvec"), nProbe)).as("cell"))
    // nAssign x nProbe can surface the same (query, base) pair via
    // several cells — identical ADC rows, the narrow dedupe inside
    // adcThenRefine keeps one
    adcThenRefine(
      assigned.join(broadcast(qCells.select(col("qid"), col("qtab"),
        col("cell"))), Seq("cell")),
      base, qdf, cb, k, refine, dedupe = true)
  }
}
