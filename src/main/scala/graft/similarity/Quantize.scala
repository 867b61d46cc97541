package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization — the storage/bandwidth lever
  * for ANN at corpus scale: a 64-dim float vector is 256 bytes, its
  * int8 form is 64 bytes + one double scale, and integer dot products
  * replace float ones in the candidate-scoring hot path.
  *
  * Determinism is the design center: quantization is computed in
  * DOUBLE with single-rounding ops only (abs, max, /, +, floor), so
  * an external engine recomputing the same formula gets bit-identical
  * codes — which is what lets the pairwise-similarity math sit under
  * the hard DuckDB oracle (exact integer arithmetic) where the float
  * cosine paths could only ever be rows-only checked.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization of an array<float|double>
    * column: scale = max(|x|)/127, q_i = floor(x_i/scale + 0.5)
    * (round-half-up; floor keeps the rule identical across engines).
    * All-zero vectors quantize to all-zero codes with scale 0.
    * Returns struct(scale double, q array<int>). */
  def int8(vec: Column): Column = {
    val d = transform(vec, x => x.cast("double"))
    val m = array_max(transform(d, x => abs(x)))
    val scale = m / lit(127.0)
    // the scale is broadcast across elements via array_repeat +
    // zip_with so the lambda only touches element variables — a scale
    // referenced INSIDE the lambda would re-run its array_max per
    // element (interpreted lambdas have no subexpression elimination)
    val q = zip_with(d, array_repeat(scale, size(vec)),
      (x, s) => when(s === lit(0.0), lit(0))
        .otherwise(floor(x / s + lit(0.5)).cast("int")))
    struct(scale.as("scale"), q.as("q"))
  }

  /** Reconstruction: q_i * scale (for error-bound checks; the bound
    * is |x_i - q_i*scale| <= scale/2 by construction). */
  def dequantize(q: Column, scale: Column): Column =
    zip_with(q, array_repeat(scale, size(q)),
      (x, s) => x.cast("double") * s)

  /** Exact integer dot product of two int8 code arrays (long math —
    * 64 products of +-127 values is far inside exact range). */
  def intDot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Stable text signature of a code array (for hash-compare oracles
    * and content-addressed caching of quantized shards). */
  def signature(q: Column): Column =
    md5(array_join(transform(q, _.cast("string")), ","))
}
