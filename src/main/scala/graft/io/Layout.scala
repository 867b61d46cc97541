package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical file-layout control for Parquet sinks — the data-skipping
  * half of the scale story. Partition directories (crawl_index,
  * jobs/Runner) prune whole directories; WITHIN a partition, Parquet
  * skips row groups whose column min/max statistics exclude a pushed
  * predicate. That only helps if the writer CLUSTERS rows so each row
  * group covers a narrow key range: the same 100 TB written in
  * arrival order answers a selective range scan by reading everything,
  * written range-clustered it reads the one row group that matters
  * (LayoutSpec pins the delivered skip ratio through the scan's
  * numOutputRows metric, not by assumption).
  *
  * `zorderKey` extends the same idea to TWO selective dimensions:
  * interleaving the bits of both keys makes row-group min/max ranges
  * tight on each dimension separately, so filters on either column
  * skip — the classic space-filling-curve layout (public literature:
  * Morton order; used by several lakehouse table formats).
  */
object Layout {

  /** Range-cluster `df` into `numFiles` files sorted by `cols`: each
    * output file covers a narrow, non-overlapping range of the
    * cluster key, which is what gives Parquet row-group statistics
    * their pruning power. One shuffle (range exchange over a sampled
    * boundary map), then a local sort per file. */
  def clusteredWrite(
      df: DataFrame, cols: Seq[Column], numFiles: Int, path: String): Unit =
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)

  /** Morton (z-order) key: interleave the low `bits` bits of two
    * non-negative int columns — a at even bit positions, b at odd.
    * Inputs must already be non-negative and < 2^bits (bucketize or
    * rank first; 21 bits each keeps the result within a long's
    * mantissa-safe range). Pure bit arithmetic on columns — codegen'd,
    * no UDF. */
  def zorderKey(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val spread = (c: Column, offset: Int) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + offset)
      }.reduce(_.bitwiseOR(_))
    spread(a, 0).bitwiseOR(spread(b, 1))
  }
}
