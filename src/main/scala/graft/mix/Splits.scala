package graft.mix

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic train/validation splits: a document's split is a
  * pure function of its key's md5 (content/id-addressed), so the
  * assignment is reproducible across runs, clusters, and partition
  * layouts, and survives re-ingestion — the property random() splits
  * lack. Row-local Column math, no shuffle.
  *
  * The bucket is the first 16 bits of md5(key) (4 hex nibbles, the
  * same SQL-recomputable construction as the simhash word hash),
  * modulo 1000 — permille granularity for split fractions.
  */
object Splits {

  private val hexmap = "0123456789abcdef"

  /** Permille bucket in [0, 1000) from md5(key). */
  def bucket(key: Column): Column = {
    val h = md5(key.cast("string"))
    def nib(i: Int): Column =
      (instr(lit(hexmap), substring(h, i + 1, 1)) - 1).cast("int")
    val v = nib(0) * 4096 + nib(1) * 256 + nib(2) * 16 + nib(3)
    pmod(v, lit(1000))
  }

  /** "valid" for keys whose bucket falls under `validPerMille`,
    * else "train". */
  def assign(key: Column, validPerMille: Int = 50): Column =
    when(bucket(key) < validPerMille, "valid").otherwise("train")
}
