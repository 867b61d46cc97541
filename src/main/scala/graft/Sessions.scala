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
    val spark = SparkSession.builder()
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }
}
