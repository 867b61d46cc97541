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
    // Parameterized PRODUCTION JOIN PROFILE (guide §3.1 + §5),
    // opt-in via SPARK_GRAFT_JOIN_PROFILE=prod; the default leaves
    // every join setting at stock so the driver's bench stays
    // comparable across rounds (a local[32]-tuned constant would be
    // a fake win — round rules). What it does and why:
    //  - preferSortMergeJoin=false lets the planner pick SHUFFLED
    //    HASH JOIN where its size checks pass, and the AQE local-map
    //    threshold lets AQE rewrite a planned sort-merge to shuffled
    //    hash at runtime when every post-shuffle partition is small
    //    enough to build. The memory-bound join family (q_j1's
    //    full-outer merge, q_j2's overwrite) spends its 1000x-scale
    //    time in parallel sort-run SPILL through the local heap
    //    (r16 ladder: q_j1 122 s at 600M rows, cpu/wall 26, the last
    //    10x costing 12.6x) — a hash build sized under the partition
    //    bound skips the sort entirely.
    //  - measured at 600M rows / 8 GB heap, solo per arm — numbers
    //    and result-parity evidence in OPTIMIZATION_r17.md
    //    ("Production join profile"); sf0.1 plans and bench numbers
    //    are UNCHANGED with the profile off (the default).
    //  - the risk this trades: an SHJ build-side partition that does
    //    not fit memory fails where SMJ would spill — size
    //    maxShuffledHashJoinLocalMapThreshold to what one task can
    //    hold (heap / cores / ~4 safety), the reasoning the 128m
    //    default below encodes for an 8 GB x 32-core local profile.
    val spark = (sys.env.get("SPARK_GRAFT_JOIN_PROFILE") match {
      case Some("prod") => builder
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
          sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "128m"))
      case _ => builder
    }).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }
}
