package graft

import org.apache.spark.sql.DataFrame

/** Iteration-state checkpointing for the iterative kernels
  * (connected components' per-round edge frame, BPE training's
  * periodic word-table re-materialization).
  *
  * `localCheckpoint` keeps blocks in executor memory/disk — fast,
  * but the blocks die with their executor, so on a real cluster one
  * lost executor kills an hours-long run mid-iteration. When the
  * SparkContext has a RELIABLE checkpoint directory configured
  * (`sc.setCheckpointDir(...)` — HDFS/object store on a cluster),
  * iteration state goes through `Dataset.checkpoint` instead: blocks
  * land in fault-tolerant storage and a lost executor merely re-reads
  * them. Opting in is one session-level call, not a code edit — the
  * kernels detect the dir and switch.
  *
  * EAGER per-round checkpoints route through [[iter]]; lazy
  * plan-dedup frames that outlive one action (the kernels' input
  * snapshots and returned label frames) route through
  * [[lazyCheckpoint]] so the reliable mode covers them too — a
  * materialized lazy localCheckpoint has truncated lineage and is
  * NOT recomputable after executor loss. Only genuinely
  * single-action plan-dedup frames keep plain localCheckpoint. */
object Checkpoints {

  /** Eager checkpoint of one round's iteration state: reliable when
    * the context has a checkpoint dir, local otherwise. Both forms
    * truncate lineage and preserve the frame's partitioning.
    *
    * The reliable path persists the frame BEFORE checkpointing:
    * `Dataset.checkpoint(eager)` runs one job to materialize and
    * then the checkpoint write re-computes the RDD (Spark's own
    * scaladoc warns of this) — against an un-cached plan that would
    * double every round's compute, exactly on the hours-long runs
    * the reliable path exists for. With the persist, the second
    * pass re-reads cached blocks; the cache is dropped once the
    * checkpoint holds the data. Old rounds' checkpoint FILES are
    * reclaimed by the ContextCleaner when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (set by
    * [[Sessions.local]]; set it on your cluster session too, or an
    * hours-long iterative run accumulates O(rounds x frame) in the
    * checkpoint dir). */
  def iter(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val persisted = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = persisted.checkpoint(eager = true)
      persisted.unpersist(blocking = false)
      out
    } else df.localCheckpoint(eager = true)

  /** Lazy plan-dedup checkpoint for frames REFERENCED ACROSS rounds
    * or returned to the caller (connectedComponents' input snapshot
    * and result labels): reliable when a checkpoint dir is set,
    * local otherwise. The distinction matters because a lazy
    * localCheckpoint is only recompute-safe UNTIL materialized —
    * once round 0 materializes it, its lineage is truncated and the
    * blocks live solely in executor storage, so an executor lost at
    * round 30 of an hours-long reliable run would kill the query
    * through this one frame even though every round frame went to
    * the reliable dir. Genuinely single-action plan-dedup frames
    * (both consumers inside one job) can keep plain localCheckpoint. */
  def lazyCheckpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)
}
