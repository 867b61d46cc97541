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
  def zorderKey(a: Column, b: Column, bits: Int = 21): Column =
    zorderKey(Seq(a, b), bits)

  /** N-dimensional Morton key: column j contributes its bit i at
    * output position `i * n + j` (round-robin interleave), so
    * row-group min/max ranges stay tight on EVERY clustered dimension
    * and a filter on any one of them skips. `bits * n` must fit a
    * signed long (<= 63); with more selective dimensions, spend fewer
    * bits per dimension — the high bits dominate the sort order, so
    * truncated low bits only coarsen locality, never break it. */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zorderKey needs at least one column")
    require(bits > 0 && bits * n <= 63,
      s"bits*cols must be in [1,63], got $bits*$n")
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
          i * n + j)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }
}
