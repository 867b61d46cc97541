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
  *    scores. `refine >= base rows / k` degenerates to brute force
  *    exactly (the oracle's exactness regime, q_ann_pq_exact).
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
    val dim = base.filter(col("vec").isNotNull).limit(1)
      .select(size(col("vec"))).collect()
      .headOption.filter(!_.isNullAt(0)).map(_.getInt(0)).getOrElse(m).max(m)
    require(dim % m == 0, s"vector dim $dim must be divisible by m=$m")
    val dsub = dim / m
    val norm = sqrt(aggregate(
      transform(col("vec"), y => y.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val unitVec = zip_with(col("vec"),
      array_repeat(norm, size(col("vec"))),
      (x, nn) => x.cast("double") / nn)
    // same dimension-aware fit budget as ivfTopK: rows scale as 1/d
    // past the byte budget, floored so every subspace still sees points
    val fitBudgetBytes = 64L << 20
    val fitCap = math.min(
      math.max(k * 2000, 20000).toLong,
      math.max(k * 50L, fitBudgetBytes / (8L * dim))).toInt
    val pts = base
      .orderBy(xxhash64(col("id").cast("string")), col("id"))
      .limit(fitCap)
      .select(unitVec.as("uvec"))
      .collect().iterator
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Double](0).toArray)
      .filter(p => p != null && p.length == dim &&
        p.forall(d => !d.isNaN && !d.isInfinite))
      .toArray
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

  /** PQ-accelerated top-k: ADC scan keeps `refine * k` candidates
    * per query, exact cosine re-ranks them. Queries are collected to
    * the driver to build their ADC tables (the query side is small
    * by the family's standing assumption — it is broadcast in every
    * ANN variant here); qid keeps its source type. */
  /** (qid, qvec, qtab): the collected query side with per-query ADC
    * tables — the broadcastable frame every PQ search variant probes
    * with. qid keeps its source type. */
  private def queryTableFrame(queries: DataFrame, cb: Codebooks): DataFrame = {
    val qSchema = StructType(Seq(
      queries.schema("qid"),
      StructField("qvec", ArrayType(FloatType), nullable = true),
      StructField("qtab", ArrayType(FloatType, containsNull = false))))
    val qRows = queries.select(col("qid"), col("qvec")).collect().toSeq.map { r =>
      val qv = r.getSeq[Float](1).toArray
      Row(r.get(0), qv.toSeq, adcTable(qv, cb).toSeq)
    }
    queries.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](qRows.asJava), qSchema)
  }

  /** ADC cut (refine*k per query) then exact cosine re-rank (k). */
  private def adcThenRefine(
      cand: DataFrame, cb: Codebooks, k: Int, refine: Int): DataFrame = {
    val adcRanked = Window.partitionBy(col("qid"))
      .orderBy(col("adc").desc, col("id"))
    val cut = cand
      .withColumn("adc", adc(col("codes"), col("qtab"), cb))
      .withColumn("arank", row_number().over(adcRanked))
      .filter(col("arank") <= refine.toLong * k)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    cut
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
    val coded = base.select(col("id"), col("vec"),
      encode(col("vec"), cb).as("codes"))
    adcThenRefine(
      coded.crossJoin(broadcast(queryTableFrame(queries, cb))),
      cb, k, refine)
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
    val cents = Similarity.coarseCells(base, nLists, seed)
    val cb = fit(base, m, kCodes, seed)
    val assigned = base.select(col("id"), col("vec"),
      encode(col("vec"), cb).as("codes"),
      explode(Similarity.nearestCells(cents, col("vec"), nAssign)).as("cell"))
    val qCells = queryTableFrame(queries, cb)
      .select(col("qid"), col("qvec"), col("qtab"),
        explode(Similarity.nearestCells(cents, col("qvec"), nProbe)).as("cell"))
    val cand = assigned.join(broadcast(qCells), Seq("cell"))
      // nAssign x nProbe can surface the same (query, base) pair via
      // several cells — identical rows, any one survives
      .dropDuplicates("qid", "id")
    adcThenRefine(cand, cb, k, refine)
  }
}
