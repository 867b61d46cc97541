package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training shards: assign each document to a
  * shard so that shards fill a fixed token budget in id order — the
  * "pack the corpus into max-N-token files" step every training-data
  * pipeline runs before writing tfrecord/arrow shards.
  *
  * The shard of a document is floor(prefixTokens / budget), where
  * prefixTokens is the EXCLUSIVE prefix sum of token counts in id
  * order — a pure function of the data, independent of partitioning.
  *
  * Scale shape: the naive form is a global `Window.orderBy(id)`
  * running sum, which Spark executes as a SINGLE partition — a
  * scale-killer at 100 TB. This implementation is the classic
  * distributed prefix sum instead: project down to (id, tokens)
  * FIRST, range-repartition that 16-byte projection by id, take
  * per-partition running sums, and splice partitions together with a
  * per-partition offset table (one row per partition — the only
  * thing that touches the driver). The document text itself shuffles
  * ZERO times, and every stage is as parallel as the partition
  * count; only the two narrow exchanges (range, then pid clustering
  * for the window) move data at all.
  */
object Packing {

  /** (idCol, shard) for every row. `tokens` is any integer Column
    * (e.g. TextStats.tokenCount(col("text"))). */
  def packShards(
      df: DataFrame,
      idCol: String,
      tokens: Column,
      budget: Long,
      partitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    withPrefix(df, idCol, tokens, partitions)
      .withColumn("shard",
        floor(col("__pref") / lit(budget)).cast("int"))
      .select(col(idCol), col("shard"))
  }

  /** Document-SPLITTING packing: like [[packShards]] but a document
    * that straddles a shard boundary is split at the token budget,
    * the way real shard writers fill every file to exactly `budget`
    * tokens with the remainder carried into the next shard (no
    * per-shard slack, no over-budget shard). One output row per
    * (document, shard it occupies): `(idCol, shard, tok_start,
    * tok_end)`, where [tok_start, tok_end) is the document-local
    * token slice landing in that shard; slices of one document are
    * contiguous, start at 0, and sum to its token count. Zero-token
    * documents emit one empty [0, 0) row in the shard the prefix sum
    * places them (same shard [[packShards]] assigns).
    *
    * Same distributed prefix-sum shape as [[packShards]] — never a
    * global single-partition window; the only addition is a row-local
    * `sequence` explode spanning floor(p/budget)..floor((p+n-1)/
    * budget), which is at most n/budget + 1 rows per document —
    * bounded by the document's own size, so the explode cannot skew.
    * Token arithmetic stays exact while total corpus tokens stay
    * under 2^53 (the shared floor-division discipline; ~9e15 tokens,
    * two orders above a 100 TB corpus). */
  def packShardsSplit(
      df: DataFrame,
      idCol: String,
      tokens: Column,
      budget: Long,
      partitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    val b = lit(budget)
    withPrefix(df, idCol, tokens, partitions)
      .withColumn("shard", explode(sequence(
        floor(col("__pref") / b).cast("long"),
        floor(greatest(col("__pref") + col("__tok") - 1, col("__pref")) / b)
          .cast("long"))))
      .select(col(idCol), col("shard").cast("int").as("shard"),
        greatest(lit(0L), col("shard") * b - col("__pref"))
          .as("tok_start"),
        least(col("__tok"), (col("shard") + lit(1L)) * b - col("__pref"))
          .as("tok_end"))
  }

  /** The shared distributed exclusive prefix sum: returns
    * `(idCol, __tok, __pref)` where __pref is the sum of __tok over
    * all ids strictly before this one in id order. */
  private def withPrefix(
      df: DataFrame,
      idCol: String,
      tokens: Column,
      partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val nPart =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // one shuffle: contiguous id ranges, pid increasing with id
    // The offset table below is computed from one evaluation of
    // `ranged` and applied to another; that is sound because
    // repartitionByRange is DETERMINISTIC for a stable input (range
    // bounds come from reservoir sampling seeded by partition index),
    // so both evaluations see identical pids. File sources are
    // stable; feed this a nondeterministic frame and you must
    // checkpoint it first.
    val ranged = df.select(col(idCol), tokens.cast("long").as("__tok"))
      .repartitionByRange(nPart, col(idCol))
      .withColumn("__pid", spark_partition_id())
    // per-partition totals: one row per partition — a driver-side
    // tiny dim (same class as k-means centroids), NOT a data collect
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(col("__tok")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(
      pids.scanLeft(0L)((acc, p) => acc + totals(p)).init).toMap
    val offsetCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.toSeq.sortBy(_._1).flatMap { case (p, o) =>
          Seq(lit(p), lit(o)) }: _*), col("__pid"))
    // running sum within each range partition; the window's pid
    // clustering re-shuffles only the narrow projection
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = coalesce(sum(col("__tok")).over(w), lit(0L)) + offsetCol
    ranged.withColumn("__pref", prefix)
      .select(col(idCol), col("__tok"), col("__pref"))
  }
}
