package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.crawl.{Extractors, WarcStore, WatExtract}
import graft.io.Tsv
import graft.license.Licenses
import graft.loadmerge.Merge
import graft.popularity.Popularity
import graft.storage.ImageStore

/** Sequential orchestration of the reference's three lifecycles
  * (SURVEY §3) as one Spark application — the stand-in for the
  * reference's Airflow DAG wiring (§7.5 non-goal), demonstrating that
  * the engine's pieces compose end-to-end:
  *
  *   phase A (3.1): WAT lines -> CC-link table -> parquet + summary
  *   phase B (3.2): provider slice -> WARC point reads -> HTML
  *                  extraction -> cleaning/enrichment -> TSV
  *   phase C (3.3): TSV -> bounded load -> required-drop -> last-wins
  *                  dedupe -> J1 merge into the canonical table
  *   popularity:    percentile constants -> standardized score view
  */
object Runner {

  final case class RunResult(
      links: DataFrame,
      topDomains: DataFrame,
      extracted: DataFrame,
      canonical: DataFrame,
      imageView: DataFrame)

  /** Phase A over WAT envelope lines. The output is PARTITIONED BY
    * crawl index — the reference lays phase-A results out as one
    * directory per `CC-MAIN-yyyy-ww` and every downstream read targets
    * a single index (docs/cc-catalog.md:150-160, Provider.py:256-257),
    * so the formal partition column gives provider slices partition
    * pruning for free and keeps a 100-crawl history scannable without
    * listing unrelated indexes. Dynamic partition overwrite means a
    * re-run of one crawl replaces only its own partition, never the
    * accumulated history. */
  def phaseA(spark: SparkSession, watLines: Dataset[String], outDir: String,
      crawlIndex: String = "CC-MAIN-0000-00"): DataFrame = {
    cleanLegacyFlatLayout(spark, s"$outDir/cc_links")
    val links = WatExtract.extract(spark, watLines)
      .withColumn("crawl_index", lit(crawlIndex))
    links.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("crawl_index")
      .parquet(s"$outDir/cc_links")
    // Return only the crawl just written: the accumulated table holds
    // every historical index, and downstream phase-B/topDomains consume
    // a single crawl (the pruning the partition column exists for).
    spark.read.parquet(s"$outDir/cc_links")
      .where(col("crawl_index") === crawlIndex)
  }

  /** Pre-partitioning phaseA wrote plain parquet files at the cc_links
    * root; dynamic partition overwrite never deletes root-level files,
    * so a mixed flat+partitioned directory would fail Spark's partition
    * discovery. Remove the legacy flat snapshot before the first
    * partitioned write (partition subdirectories are left untouched). */
  private def cleanLegacyFlatLayout(spark: SparkSession, dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) {
      fs.listStatus(path).foreach { st =>
        if (st.isFile && !st.getPath.getName.startsWith("_"))
          fs.delete(st.getPath, false)
      }
    }
  }

  /** Phase B: slice one provider, fetch WARC members, extract gallery
    * rows, clean + enrich into the 17-col relation, write TSV. */
  def phaseB(
      spark: SparkSession,
      links: DataFrame,
      providerDomain: String,
      provider: String,
      warcRoot: String,
      outDir: String): DataFrame = {
    import spark.implicits._
    val slice = WatExtract.providerSlice(links, providerDomain)
    val refs = slice.select(
        col("url"), col("warc_path").as("warcPath"),
        col("content_offset").as("offset"),
        col("deflate_length").as("deflateLength"))
      .as[WarcStore.WarcRef]
    val pages = WarcStore.fetchPages(refs, warcRoot)
    val rows = Extractors.extractAll(pages, new Extractors.GalleryExtractor(provider))
    val (lic, ver) = Licenses.licenseFromPath(col("license_path"))
    val raw = rows.toDF()
      .select(
        col("foreign_identifier"), col("foreign_landing_url"),
        col("image_url"),
        lit(null).cast("string").as("thumbnail_url"),
        lit(null).cast("string").as("width"),
        lit(null).cast("string").as("height"),
        lit(null).cast("string").as("filesize"),
        lic.as("license_"), ver.as("license_version"),
        lit(null).cast("string").as("creator"),
        lit(null).cast("string").as("creator_url"),
        col("title"),
        lit(null).cast("map<string,string>").as("meta_data"),
        col("tags"),
        // add_item's watermarked DEFAULT is the string 'f', not null
        // (image.py:147) — providers that never set it emit `f`
        lit("f").as("watermarked"),
        lit(null).cast("string").as("source"),
        concat(lit("https://creativecommons.org"), col("license_path"))
          .as("license_url"),
        concat(lit("https://creativecommons.org"), col("license_path"))
          .as("raw_license_url"))
    // D2 (Provider.py:310-314): the dual pre-sink dedupe — first on
    // (provider, image_url), then on (provider, foreign_identifier) —
    // so one crawl batch never carries two rows for the same image or
    // the same foreign id into the TSV. The sink relation
    // (ImageStore.toTsv) carries the reference's load-bearing column
    // ORDER with jsonb cells recursively leaf-sanitized.
    val prepared = ImageStore.toTsv(
      ImageStore.prepare(raw, provider)
        .dropDuplicates("provider", "image_url")
        .dropDuplicates("provider", "foreign_identifier"))
    Tsv.write(prepared, s"$outDir/tsv/$provider", singleFile = true)
    prepared
  }

  // _IMAGE_TSV_COLUMNS order (image.py:12-67) — the same 17-column
  // order ImageStore.toTsv writes; the load boundary reads jsonb cells
  // as strings (suffix _json) before typing them.
  private val loadSchema = org.apache.spark.sql.types.StructType.fromDDL(
    """foreign_identifier STRING, foreign_landing_url STRING,
      |image_url STRING, thumbnail_url STRING, width STRING,
      |height STRING, filesize STRING, license_ STRING,
      |license_version STRING, creator STRING, creator_url STRING,
      |title STRING, meta_data_json STRING, tags_json STRING,
      |watermarked STRING, provider STRING, source STRING""".stripMargin
      .replace("\n", " "))

  /** The phase-C load step: bounded TSV read, typed jsonb columns,
    * required-field drop, last-wins dedupe. */
  def loadCleaned(spark: SparkSession, tsvDir: String): DataFrame = {
    val loaded = Tsv.readBounded(spark, tsvDir, loadSchema, maxBad = 10)
      .withColumn("meta_data",
        from_json(col("meta_data_json"), lit("map<string,string>")))
      .withColumn("tags", from_json(col("tags_json"),
        lit("array<struct<name:string,provider:string>>")))
      .drop("meta_data_json", "tags_json")
      // Load order must be RETRY-STABLE: the last-wins tiebreak is the
      // row's physical file position, not a partition-layout artifact
      // (a bare monotonically_increasing_id changes winners when the
      // scan is re-planned or a task retries). CSV scans expose no
      // _metadata.row_index (parquet-only), so the stable total order
      // is (file_path, file_block_start, within-block sequence):
      // block starts are monotone in file offset and a block is read
      // by exactly one task in file order, so comparing this struct
      // ranks rows by absolute file position under ANY partition
      // layout — matching the reference's physical-order ctid
      // semantics (util/loader/sql.py last-insert-wins).
      .withColumn("__ord", struct(
        col("_metadata.file_path"),
        col("_metadata.file_block_start"),
        monotonically_increasing_id()))
    Merge.dedupeLastWins(
      Merge.dropRequiredNull(loaded,
        Seq("image_url", "license_", "foreign_landing_url", "foreign_identifier")),
      "provider", "foreign_identifier", "__ord").drop("__ord")
  }

  private def canonicalSpec(joinOnRawKey: Boolean) = Merge.MergeSpec(
    provider = "provider", foreignId = "foreign_identifier",
    scalarCols = Seq("foreign_landing_url", "image_url", "thumbnail_url",
      "width", "height", "filesize", "license_", "license_version",
      "creator", "creator_url", "title", "watermarked", "source"),
    mapCols = Seq("meta_data"), arrayCols = Seq("tags"),
    createdOn = Some("created_on"), updatedOn = Some("updated_on"),
    joinOnRawKey = joinOnRawKey)

  /** The bucketed-merge spec, exposed so plan tests can reproduce the
    * exact join phaseCBucketed runs. */
  def canonicalSpecForTest: Merge.MergeSpec = canonicalSpec(joinOnRawKey = true)

  /** Phase C: TSV -> clean -> dedupe -> merge into canonical table.
    *
    * The snapshot is written RANGE-CLUSTERED on (provider, updated_on)
    * (io/Layout.clusteredWrite): the canonical table's two standing
    * access patterns are a provider slice (every reingestion read,
    * Provider.py:256-257 analog) and "what changed since <date>"
    * maintenance scans, and clustering makes both prune at the Parquet
    * row-group level instead of reading the full history. Cost is one
    * range exchange on a write that already rewrites every row.
    * `clusterFiles` <= 0 sizes the layout to the session's shuffle
    * parallelism; at real scale pass ~(table size / target file size). */
  def phaseC(
      spark: SparkSession,
      tsvDir: String,
      canonicalDir: String,
      now: org.apache.spark.sql.Column,
      clusterFiles: Int = 0): DataFrame = {
    val cleaned = loadCleaned(spark, tsvDir)
    val spec = canonicalSpec(joinOnRawKey = false)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      cleaned.schema
        .add("created_on", "timestamp").add("updated_on", "timestamp"))
    // ONLY a missing path means "first run": any other failure
    // (corrupt footer, permissions, transient IO) must abort, or the
    // merge would run against an empty target and the swap below would
    // silently discard the existing canonical data.
    val target =
      try spark.read.parquet(canonicalDir)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" ||
              e.getMessage.contains("Path does not exist") =>
          empty
      }
    val merged = Merge.upsertMerge(target,
      cleaned.withColumn("created_on", now).withColumn("updated_on", now),
      spec, now)
    val nFiles =
      if (clusterFiles > 0) clusterFiles
      else spark.sessionState.conf.numShufflePartitions
    // repartitionByRange's RangePartitioner runs a SAMPLING job over
    // its child before the shuffle executes it again — materialize the
    // merge once so the load+upsert join isn't computed twice per
    // snapshot (the repo's standing consumed-twice discipline)
    graft.io.Layout.clusteredWrite(merged.localCheckpoint(),
      Seq(col("provider"), col("updated_on")), nFiles, s"$canonicalDir.next")
    // Recompute-and-swap snapshot (the matview stand-in, SURVEY §4).
    // The swap is rename-based: retire current -> .old, promote .next
    // -> current, then drop .old. A crash at any point leaves at least
    // one complete copy on disk (.next, .old, or current) — never the
    // rewrite-in-place window where current is half-written.
    import java.nio.file.{Files, Paths}
    def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
    val cur = Paths.get(canonicalDir)
    val nxt = Paths.get(s"$canonicalDir.next")
    val old = Paths.get(s"$canonicalDir.old")
    rmTree(old)
    if (Files.exists(cur)) Files.move(cur, old)
    Files.move(nxt, cur)
    rmTree(old)
    spark.read.parquet(canonicalDir)
  }

  /** Phase C, bucketed: the canonical table lives in the catalog
    * BUCKETED BY (provider, foreign_identifier), so every repeated
    * daily load merges WITHOUT shuffling the canonical side — at
    * 100 TB the big table never moves, only the day's increment is
    * hash-partitioned into the bucket layout (BucketingSpec proves the
    * Exchange-free plan; RunnerSpec asserts it end-to-end here).
    * The snapshot swap is a catalog rename: `<name>__next` is written
    * complete, the old table dropped, the new one renamed in — at any
    * crash point one complete table exists. */
  def phaseCBucketed(
      spark: SparkSession,
      tsvDir: String,
      tableName: String,
      now: org.apache.spark.sql.Column,
      buckets: Int = 0): DataFrame = {
    // Bucket count must be >= the shuffle parallelism or the planner
    // judges the 'free' bucketed distribution under-parallel and
    // re-shuffles BOTH sides (DisableUnnecessaryBucketedScan). Size
    // buckets to the cluster's partition budget, not a small constant.
    val nBuckets =
      if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions
    val next = s"${tableName}__next"
    val old = s"${tableName}__old"
    // Crash repair: a death between the swap's rename-out and
    // rename-in leaves the canonical name unbound with the previous
    // snapshot intact under __old. Restore it BEFORE reading the merge
    // target — otherwise this run would see "first run", merge against
    // empty, and the DROP of __old below would discard the history.
    if (!spark.catalog.tableExists(tableName) && spark.catalog.tableExists(old))
      spark.sql(s"ALTER TABLE $old RENAME TO $tableName")
    val cleaned = loadCleaned(spark, tsvDir)
    val spec = canonicalSpec(joinOnRawKey = true)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      cleaned.schema
        .add("created_on", "timestamp").add("updated_on", "timestamp"))
    val target =
      if (spark.catalog.tableExists(tableName)) spark.table(tableName)
      else empty
    val merged = Merge.upsertMerge(target,
      cleaned.withColumn("created_on", now).withColumn("updated_on", now),
      spec, now)
    spark.sql(s"DROP TABLE IF EXISTS $next")
    merged.write
      .bucketBy(nBuckets, "provider", "foreign_identifier")
      .sortBy("provider", "foreign_identifier")
      .saveAsTable(next)
    // Swap by rename-out / rename-in / drop-retired — never DROP the
    // canonical name before its replacement is promoted: a crash
    // between a drop and a rename would leave the canonical name
    // unbound with the data stranded under __next (manual repair).
    // With this order every crash point leaves a complete table under
    // the canonical name or a one-rename repair away (__old/__next).
    spark.sql(s"DROP TABLE IF EXISTS $old") // leftover from a prior crash
    if (spark.catalog.tableExists(tableName))
      spark.sql(s"ALTER TABLE $tableName RENAME TO $old")
    spark.sql(s"ALTER TABLE $next RENAME TO $tableName")
    spark.sql(s"DROP TABLE IF EXISTS $old")
    spark.table(tableName)
  }

  /** Popularity refresh (SURVEY §3 honorable-mention lifecycle). */
  def popularityView(canonical: DataFrame, metric: org.apache.spark.sql.Column,
      percentile: Double): DataFrame = {
    val consts = Popularity.percentileConstants(
      canonical, "provider", metric, percentile)
    Popularity.standardized(canonical, "provider", metric, consts)
  }

  /** The whole pipeline over local fixtures. */
  def run(
      spark: SparkSession,
      watLines: Dataset[String],
      providerDomain: String,
      provider: String,
      warcRoot: String,
      workDir: String): RunResult = {
    val links = phaseA(spark, watLines, workDir)
    val top = WatExtract.topDomains(links)
    val extracted = phaseB(spark, links, providerDomain, provider, warcRoot, workDir)
    val canonical = phaseC(spark, s"$workDir/tsv/$provider",
      s"$workDir/image", lit("2024-06-01 00:00:00").cast("timestamp"))
    // metric must be non-null per row: the TSV boundary reads empty
    // unquoted fields back as null (title of an alt-less image), and
    // standardized popularity null-propagates by contract
    val view = popularityView(canonical, length(col("image_url")).cast("double"), 0.5)
    RunResult(links, top, extracted.toDF(), canonical, view)
  }
}
