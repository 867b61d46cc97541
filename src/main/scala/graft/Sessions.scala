package graft

import org.apache.spark.sql.SparkSession

/** One place to build SparkSessions so every entry point (Verify,
  * Bench, tests) runs with identical semantics.
  *
  * - ANSI mode OFF: the reference's cleaning layer is permissive —
  *   unparseable casts yield null, not errors (columns.py:70-86) —
  *   and the DuckDB oracle comparisons use TRY_CAST for the same
  *   behavior. Legacy (non-ANSI) cast matches that contract.
  * - UTC session timezone: all testdata timestamps are naive UTC.
  * - shuffle.partitions = cpu count locally; at cluster scale this is
  *   AQE-coalesced from a higher initial number instead.
  */
object Sessions {
  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // Older testdata generations carry events.ts as
      // TIMESTAMP(NANOS); Spark reads it as a long under this flag
      // (Tables.events converts to a microsecond timestamp, matching
      // DuckDB's ns->us truncation). Newer generations ship
      // TIMESTAMP(MICROS) without UTC adjustment, which arrives as
      // TIMESTAMP_NTZ — Tables.events normalizes that too.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // reclaim reliable-checkpoint files once their RDD is GC'd —
      // without this an iterative kernel run against a checkpoint
      // dir (Checkpoints.iter) accumulates every round's frame
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // InferFiltersFromGenerate synthesizes `size(e) > 0 AND e IS
      // NOT NULL` from explode(e) — and predicate pushdown then
      // substitutes e's FULL defining expression into that filter and
      // sinks it below the projection, so an exploded computed array
      // (shingling, n-gram windows) is evaluated twice per row, the
      // filter copy interpreted. Measured at sf0.1: the documents
      // token stream 3.4 s -> 0.45 s, decontaminate 3.7 s -> 0.8 s
      // with the rule off. Our exploded arrays are computed and
      // essentially never empty, so the rule's payoff (pruning empty
      // arrays before Generate) cannot trigger; embedders who build
      // their own SparkSession should carry this exclusion over.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // the 4.1 checksum checkpoint manager's background writer can
      // deadlock a local[n] state-store commit; plain checkpoint files
      // are fine for this engine's streaming surface
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // fork-free checkpoint IO: Hadoop's local FS shells out
      // (readlink/stat) without libhadoop, which can wedge in
      // containers — see NioCheckpointFileManager
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.NioCheckpointFileManager")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
    // NO "production join profile" knob ships, DELIBERATELY — it was
    // built and measured three ways at 600M rows / 8 GB heap / 32
    // cores (r17, guide §3.1 + §5 + §2.2; full matrix in
    // OPTIMIZATION_r17.md "Production join profile") and every arm
    // lost to this stock configuration:
    //  1. preferSortMergeJoin=false + AQE local-map threshold at the
    //     local 32-partition count: statically-planned ShuffledHash
    //     OOM'd ("not enough memory to build hash map", ~800 MB
    //     builds x 32 concurrent tasks) — the §3.1 risk verbatim.
    //  2. The same paired with 8x-cores initial shuffle partitions +
    //     64m AQE advisory (~105 MB builds): still OOM — 32
    //     concurrent builds plus probe buffers exceed the ~4.4 GB
    //     unified execution pool. A ~27 GB-shuffle full-outer join
    //     does not hash-build on this box in any form; SMJ's spill
    //     is the CORRECT strategy for it here.
    //  3. The partition lever alone (no SHJ): pass-for-pass q_j1
    //     182->256 s cold / 167->206 s warm, q_j2 173->246 s, cpu
    //     FLAT — more blocks (the §2.2 quadratic), no spill relief.
    // On a real cluster the levers may read differently (per-task
    // memory and network profiles differ) — re-measure THERE before
    // configuring; an env knob that only ever measured slower or
    // OOM-prone locally would be a footgun, not a profile.
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }
}
