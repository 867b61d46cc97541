package graft.similarity

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

import graft.plans.{PqAdc, PqEncode}

/** Product quantization for embedding search — the memory side of
  * the ANN story (public literature: Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011). The
  * d-dim vector space splits into `m` subspaces of d/m dims; each
  * subspace gets its own k-center codebook, and a base vector is
  * stored as m small code indices — 8 bytes of codes standing in
  * for 256 bytes of floats at (m=8, d=64). Queries score candidates
  * with ASYMMETRIC DISTANCE (ADC): one m x k table of
  * query-to-centroid dot products computed per query on the driver,
  * then every candidate costs m table lookups instead of a d-wide
  * float dot product.
  *
  * Scale shape, mirroring [[Similarity.ivfTopK]]'s decisions:
  *  - codebooks fit DRIVER-LOCALLY on the same deterministic bounded
  *    sample (TakeOrderedAndProject by hashed id; dimension-aware
  *    byte budget) with the same seeded Lloyd's — byte-identical
  *    codebooks every run;
  *  - encoding is one codegen'd expression pass over base
  *    ([[graft.plans.PqEncode]]), run once at index-build time;
  *  - search broadcasts the (tiny) query side WITH its precomputed
  *    ADC tables; the base side streams its codes through
  *    [[graft.plans.PqAdc]] — no base-side shuffle of vectors, only
  *    (qid, id, score) tuples move for the top-k window;
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
    * i.e. approximate cosine of unit vectors. */
  private[similarity] def adcTable(q: Array[Float], cb: Codebooks): Array[Float] = {
    val d = cb.m * cb.dsub
    var nrm = 0.0
    var i = 0
    while (i < d) { nrm += q(i).toDouble * q(i); i += 1 }
    val inv = if (nrm > 0) 1.0 / math.sqrt(nrm) else 0.0
    val out = new Array[Float](cb.m * cb.k)
    var j = 0
    while (j < cb.m) {
      var c = 0
      while (c < cb.k) {
        var s = 0.0
        var t = 0
        while (t < cb.dsub) {
          s += q(j * cb.dsub + t) * inv * cb.flat((j * cb.k + c) * cb.dsub + t)
          t += 1
        }
        out(j * cb.k + c) = s.toFloat
        c += 1
      }
      j += 1
    }
    out
  }

  /** (qid, qvec, qtab): the collected query side with per-query ADC
    * tables — the broadcastable frame every PQ search variant probes
    * with. Queries are collected to the driver to build their tables
    * (the query side is small by the family's standing assumption —
    * it is broadcast in every ANN variant here); qid keeps its source
    * type. Null or wrong-width query vectors are DROPPED here — they
    * have no well-defined neighbors, and the other ANN variants
    * null-propagate the same rows out of every window. */
  private def queryTableFrame(queries: DataFrame, cb: Codebooks): DataFrame = {
    val qSchema = StructType(Seq(
      queries.schema("qid"),
      StructField("qvec", ArrayType(FloatType), nullable = true),
      StructField("qtab", ArrayType(FloatType, containsNull = false))))
    val d = cb.m * cb.dsub
    val qRows = queries.select(col("qid"), col("qvec")).collect().toSeq
      .flatMap { r =>
        if (r.isNullAt(1)) None
        else {
          val qv = r.getSeq[Float](1).toArray
          if (qv.length != d) None
          else Some(Row(r.get(0), qv.toSeq, adcTable(qv, cb).toSeq))
        }
      }
    queries.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](qRows.asJava), qSchema)
  }

  /** ADC cut (`refine * k` candidates per query; `Int.MaxValue` is
    * the no-cut sentinel) then exact cosine re-rank (k). The cut's
    * window shuffles ONLY (qid, id, adc) — wide columns never cross
    * the exchange; the surviving candidates (refine*k per query,
    * tiny) broadcast back onto `base` to fetch true vectors for the
    * exact pass — the re-read-candidates-only shape the incremental
    * dedup paths use. */
  private def adcThenRefine(
      cand: DataFrame, // (qid, id, codes, qtab)
      base: DataFrame, // (id, vec)
      qdf: DataFrame, // (qid, qvec, qtab)
      cb: Codebooks,
      k: Int,
      refine: Int,
      dedupe: Boolean): DataFrame = {
    val narrow0 = cand.select(col("qid"), col("id"),
      adc(col("codes"), col("qtab"), cb).as("adc"))
    val narrow = if (dedupe) narrow0.dropDuplicates("qid", "id") else narrow0
    val adcRanked = Window.partitionBy(col("qid"))
      .orderBy(col("adc").desc, col("id"))
    val cut = narrow
      .withColumn("arank", row_number().over(adcRanked))
      .filter(col("arank") <= refine.toLong * k)
      .select(col("qid"), col("id"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    base.select(col("id"), col("vec"))
      .join(broadcast(cut), Seq("id"))
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
